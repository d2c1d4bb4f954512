from chronoedit_tpu.pipeline.edit_pipeline import ChronoEditPipeline, PipelineConfig

__all__ = ["ChronoEditPipeline", "PipelineConfig"]
