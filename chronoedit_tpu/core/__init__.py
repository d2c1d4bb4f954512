from chronoedit_tpu.core.schedule import FlowMatchSchedule, make_flow_schedule
from chronoedit_tpu.core.rope import Rope3DSpec, rope_3d_tables, temporal_skip_rope_tables
from chronoedit_tpu.core.rectified_flow import (
    RectifiedFlowConfig,
    get_interpolation,
    sample_train_time,
    train_time_weight,
)

__all__ = [
    "FlowMatchSchedule",
    "make_flow_schedule",
    "Rope3DSpec",
    "rope_3d_tables",
    "temporal_skip_rope_tables",
    "RectifiedFlowConfig",
    "get_interpolation",
    "sample_train_time",
    "train_time_weight",
]
