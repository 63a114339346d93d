"""Pipeline orchestration."""

from cashback_data_pipeline_spark.plans.pipeline import PipelineResult, run_pipeline, with_retry

__all__ = ["PipelineResult", "run_pipeline", "with_retry"]
