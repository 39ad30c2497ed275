from cortex_spark.pipeline.run import run_pipeline, PipelineConfig

__all__ = ["run_pipeline", "PipelineConfig"]
