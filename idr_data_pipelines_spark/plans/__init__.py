"""Pipeline composition: named stages, dependencies, retries, hooks."""

from idr_data_pipelines_spark.plans.pipeline import Pipeline, PipelineRunner, Stage

__all__ = ["Pipeline", "PipelineRunner", "Stage"]
