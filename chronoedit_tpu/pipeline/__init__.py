from chronoedit_tpu.pipeline.edit_pipeline import ChronoEditPipeline, PipelineConfig
from chronoedit_tpu.pipeline.loader import load_pipeline

__all__ = ["ChronoEditPipeline", "PipelineConfig", "load_pipeline"]
