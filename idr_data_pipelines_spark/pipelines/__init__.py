"""The four reference extract pipelines (COVID/HTS/MMD/VLS) rebuilt
over the operator library. The reference's loader DAG (idr_load) maps
to the sources layer (read_parquet_dir / read_parquet_all_string +
sinks); the extract chains reference it via ``depends_on=["idr_load"]``.

Each builder takes a :class:`~idr_data_pipelines_spark.sources.Catalog`
holding the staging + dimension tables (FIXTURES.md shapes) and an
injectable as-of date, and returns a
:class:`~idr_data_pipelines_spark.plans.Pipeline` whose stage names
match the reference task_ids one-for-one — a user of the reference can
find every transform under the same name.
"""

from idr_data_pipelines_spark.pipelines.covid import build_covid_pipeline
from idr_data_pipelines_spark.pipelines.hts import build_hts_pipeline, hts_summary
from idr_data_pipelines_spark.pipelines.mmd import build_mmd_pipeline
from idr_data_pipelines_spark.pipelines.vls import build_vls_pipeline

__all__ = [
    "build_covid_pipeline",
    "build_hts_pipeline",
    "hts_summary",
    "build_mmd_pipeline",
    "build_vls_pipeline",
]
