from chronoedit_tpu.data.mock import MockEditDataset, mock_batch_iterator
from chronoedit_tpu.data.loaders import PrefetchLoader, JointLoader

__all__ = ["MockEditDataset", "mock_batch_iterator", "PrefetchLoader", "JointLoader"]
