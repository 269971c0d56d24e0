"""Viral-load (VLS) extract chain.

Reference: idr_pipeline_from_server/dags/vls_transforms.py (11 SQL
stages, graph at :238-240). Stage names match reference task_ids
(including the copy-pasted ``deduplicate_COVID`` naming bug noted in
SURVEY.md §2.11 — preserved for discoverability).

Reference-exact semantics kept on purpose:

- ``single_patient_records`` joins the per-(Mfl_code, ccc_number) max
  date back on ``ccc_number`` ONLY, so ties and cross-site ccc
  collisions fan out (vls_transforms.py:106-109).
- ``viral_load_suppressed`` CASE covers only (<1000 & Valid) and
  (>=1000 & Invalid); a high load on a Valid test yields NULL
  (vls_transforms.py:181-185).

The chain consumes the MMD warehouse (``art_mmd``) for the merge —
the runner expresses that as ``depends_on=["mmd"]``, mirroring the
reference's ExternalTaskSensor on the MMD DAG.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from idr_data_pipelines_spark.functions import (
    as_of_date,
    bq_cast,
    bq_date_diff,
    case_bucket,
    str_sentinel_decode,
)
from idr_data_pipelines_spark.operators import (
    dedup_distinct,
    filter_eq,
    filter_not_null,
    join_left_fact,
)
from idr_data_pipelines_spark.plans import Pipeline
from idr_data_pipelines_spark.sources import Catalog


def _single_patient_records(df: DataFrame) -> DataFrame:
    """latest_vl_result + single_patient_records
    (vls_transforms.py:84-117), reference-exact: per-(Mfl_code,
    ccc_number) MAX(CAST(date AS DATE)) aggregate, LEFT-joined back to
    the detail on ``ccc_number`` ALONE, then WHERE equality on the
    date (nulls out unmatched rows → effectively inner). Ties and
    cross-site ccc collisions fan out; the output carries the
    *aggregate* side's Mfl_code as SiteCode, exactly like the SQL.

    The generic window form (operators.dedup_latest_per_key) is the
    blessed API for new code; this stage keeps the legacy semantics
    for parity."""
    rd = (
        df.groupBy("Mfl_code", "ccc_number")
        .agg(
            F.max(bq_cast(F.col("date_test_result_received"), "DATE")).alias(
                "results_date"
            )
        )
        .alias("rd")
    )
    detail = df.alias("detail")
    joined = rd.join(
        detail, F.col("rd.ccc_number") == F.col("detail.ccc_number"), "left"
    ).where(
        F.col("rd.results_date")
        == bq_cast(F.col("detail.date_test_result_received"), "DATE")
    )
    return joined.select(
        F.col("rd.Mfl_code").alias("SiteCode"),
        F.col("rd.ccc_number").alias("ccc_number"),
        F.col("rd.results_date").alias("vl_results_date"),
        F.col("detail.Gender").alias("Gender"),
        F.col("detail.DOB").alias("DOB"),
        F.col("detail.ageInYears").alias("vl_ageInYears"),
        F.col("detail.date_test_requested").alias("vl_date_test_requested"),
        F.col("detail.lab_test").alias("vl_lab_test"),
        F.col("detail.urgency").alias("vl_urgency"),
        F.col("detail.order_reason").alias("vl_order_reason"),
        F.col("detail.test_result").alias("vl_test_result"),
    )


def _merge_art_vls(catalog: Catalog):
    """merge_art_vls (vls_transforms.py:132-155): art_mmd LEFT JOIN vls
    ON PatientID = ccc_number; ART keeps all rows."""

    ART_COLS = [
        "SiteCode", "county_name", "constituency_name", "sub_county_name",
        "ward_name", "lat", "long", "DOB", "Gender", "PatientID", "PatientPK",
        "AgeEnrollment", "AgeARTStart", "AgeLastVisit", "FacilityName",
        "RegistrationDate", "PatientSource", "PreviousARTStartDate",
        "StartARTAtThisFAcility", "StartARTDate", "PreviousARTUse",
        "PreviousARTPurpose", "PreviousARTRegimen", "DateLastUsed",
        "StartRegimen", "StartRegimenLine", "LastARTDate", "LastRegimen",
        "LastRegimenLine", "ExpectedReturn", "LastVisit", "Duration",
        "ExitDate", "ExitReason", "Date_Created", "Date_Last_Modified",
        "years", "months", "days", "LastRegimenLineClean",
        "StartRegimenLineClean", "DateExpected", "CurrentDays",
        "CurrentOnTreatment", "LastARTYear", "LastARTMonth", "LastARTDay",
        "StartARTYear", "StartARTMonth", "StartARTDay",
    ]
    VLS_COLS = [
        "vl_results_date", "vl_ageInYears", "vl_date_test_requested",
        "vl_lab_test", "vl_urgency", "vl_order_reason", "vl_test_result",
    ]

    def stage(vls: DataFrame) -> DataFrame:
        art = catalog.table("art_mmd")
        merged = join_left_fact(
            art, vls, art["PatientID"] == vls["ccc_number"]
        )
        return merged.select(*[art[c] for c in ART_COLS], *[vls[c] for c in VLS_COLS])

    return stage


def _valid_results(as_of: str | _dt.date | None):
    """valid_results (vls_transforms.py:160-176): days since test from
    the injected as-of date, then the validity CASE."""

    def stage(df: DataFrame) -> DataFrame:
        with_days = df.withColumn(
            "vl_days_since_test",
            bq_date_diff(as_of_date(as_of), F.col("vl_results_date"), "DAY"),
        )
        d = F.col("vl_days_since_test")
        return with_days.withColumn(
            "vl_valid",
            case_bucket(
                d,
                [
                    (d.isNull(), F.lit("Unknown")),
                    (
                        (d < 366) & (F.col("CurrentOnTreatment") == "Yes"),
                        F.lit("Valid"),
                    ),
                ],
                default="Invalid",
            ),
        )

    return stage


def _vl_suppression(df: DataFrame) -> DataFrame:
    """viral_load_suppression (vls_transforms.py:180-191): LDL→0 decode
    to DECIMAL, then the (intentionally gap-ridden) suppression CASE —
    no ELSE, uncovered combos stay NULL."""
    # strict=True: the reference's BQ CAST fails the job loudly on a
    # malformed (non-'LDL', non-null) result string
    # (dags/vls_transforms.py:189) — silently nulling a viral-load
    # reading would flip patients to 'Unknown' suppression.
    with_load = df.withColumn(
        "load_numbers",
        str_sentinel_decode(
            "vl_test_result", {"LDL": 0}, cast_to="decimal(38,9)", strict=True
        ),
    )
    load = F.col("load_numbers")
    return with_load.withColumn(
        "viral_load_suppressed",
        case_bucket(
            load,
            [
                ((load < 1000) & (F.col("vl_valid") == "Valid"), F.lit("Suppressed")),
                (
                    (load >= 1000) & (F.col("vl_valid") == "Invalid"),
                    F.lit("Unsuppressed"),
                ),
                (load.isNull(), F.lit("Unknown")),
            ],
        ),
    )


def _eligible(df: DataFrame) -> DataFrame:
    """eligible_for_VL (vls_transforms.py:197-216)."""
    v = F.col("vl_valid")
    cot = F.col("CurrentOnTreatment")
    return df.withColumn(
        "vl_eligible",
        case_bucket(
            v,
            [
                (v == "Unknown", F.lit("Unknown")),
                ((v == "Invalid") & (cot == "Yes"), F.lit("Eligible")),
                ((v == "Valid") & (cot == "Yes"), F.lit("Test is current")),
            ],
            default="Ineligible",
        ),
    )


def build_vls_pipeline(catalog: Catalog, as_of: str | None = None) -> Pipeline:
    p = Pipeline(
        "vls",
        source=lambda spark: catalog.table("vls_staging"),
        depends_on=["mmd"],  # consumes warehouse.art_mmd
    )
    p.stage("deduplicate_COVID", dedup_distinct)  # sic — reference task name
    p.stage(
        "denullification_VLS",
        lambda df: filter_not_null(df, ["ccc_number", "Mfl_code"]),
    )
    p.stage("viral_load_only", lambda df: filter_eq(df, "lab_test", "VIRAL LOAD"))
    p.stage("single_patient_records", _single_patient_records)
    p.stage("VLS_Warehouse")  # identity → warehouse.vls
    p.stage("merge_art_vls", _merge_art_vls(catalog))
    p.stage("valid_results", _valid_results(as_of))
    p.stage("viral_load_suppression", _vl_suppression)
    p.stage("eligible_for_VL", _eligible)
    p.stage("art_vls_warehouse")  # identity → warehouse.art_mmd_vls
    p.stage("finish_pipeline")
    return p
