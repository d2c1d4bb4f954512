from chronoedit_tpu.ops.attention import dot_product_attention
from chronoedit_tpu.ops import layers

__all__ = ["dot_product_attention", "layers"]
