from chronoedit_tpu.pipeline.edit_pipeline import ChronoEditPipeline, PipelineConfig
from chronoedit_tpu.pipeline.loader import load_pipeline
from chronoedit_tpu.pipeline.server import EditServer, ServerConfig

__all__ = ["ChronoEditPipeline", "PipelineConfig", "load_pipeline",
           "EditServer", "ServerConfig"]
