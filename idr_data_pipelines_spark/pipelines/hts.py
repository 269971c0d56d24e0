"""HIV-testing (HTS) extract chain.

Reference: idr_pipeline_from_server/dags/hts_transforms.py (10 SQL
stages, graph at :239-240). Stage names match reference task_ids.

The entrypoint canonicalization is the reference's signature two-step
known/unknown classifier (SURVEY.md §2.11): entrypointclean recodes
known raw values to clean names; entrypointclean2 collapses every
*known* value to the sentinel "0"; entrypointclean3 maps "0" back to
the clean name and everything else (unknown non-null) to "Other".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from idr_data_pipelines_spark.functions import bq_date_diff, case_bucket, extract_part
from idr_data_pipelines_spark.operators import (
    agg_pivot_sum_case,
    dedup_distinct,
    filter_derived,
    join_inner_dim_cast,
)
from idr_data_pipelines_spark.plans import Pipeline
from idr_data_pipelines_spark.sources import Catalog

# Raw → clean entrypoint recode (hts_transforms.py:104-117). Grouped
# raw variants share one clean name.
ENTRYPOINT_RECODE: dict[str, str] = {
    "CCC (comprehensive care center)": "CCC",
    "CCC": "CCC",
    "OPD (outpatient department)": "OPD",
    "Out Patient Department(OPD)": "OPD",
    "VCT center": "VCT",
    "VCT": "VCT",
    "Home based HIV testing program": "Home Based Testing",
    "In Patient Department(IPD)": "IPD",
    "INPATIENT CARE OR HOSPITALIZATION": "IPD",
    "PMTCT ANC": "PMTCT",
    "PMTCT MAT": "PMTCT",
    "PMTCT Program": "PMTCT",
    "PMTCT PNC": "PMTCT",
    "OTHER NON-CODED": "Other",
    "mobile VCT program": "mobile VCT program",
    "Tuberculosis treatment program": "Tuberculosis treatment program",
    "OB/GYN department": "OB/GYN department",
}


def _recode(col: Column, mapping: dict[str, str]) -> Column:
    """null → null, unknown → passthrough (reference ELSE entrypoint)
    — exactly ``case_map(default_to_input=True)``; delegate so the
    recode-chain builder has ONE implementation (r10 review)."""
    from idr_data_pipelines_spark.functions import case_map

    return case_map(col, mapping, default_to_input=True)


def _join_mfl(catalog: Catalog):
    """HTS_joining_MFL_Codes (hts_transforms.py:57-78): INNER JOIN on
    SiteCode = CAST(staging.SiteCode AS INT), wide rename projection."""

    def stage(df: DataFrame) -> DataFrame:
        mfl = catalog.table("mfl_codes")
        joined = join_inner_dim_cast(
            df, mfl, fact_key="SiteCode", dim_key="SiteCode",
            cast_fact_key_to="bigint",
        )
        return joined.select(
            mfl["SiteCode"],
            "county_name",
            "sub_county_name",
            "lat",
            "long",
            F.col("officialname").alias("facility_name"),
            F.col("CccNumber").alias("ccc_number"),
            "PatientId",
            "DOB",
            "Gender",
            "ageInYears",
            F.col("EntryPoint").alias("entrypoint"),
            F.col("Consent").alias("patient_consented"),
            F.col("ClientTestedAs").alias("client_tested_as"),
            F.col("TestStrategy").alias("approach"),
            F.col("TestResult1").alias("test_1_result"),
            F.col("TestResult2").alias("test_2_result"),
            F.col("FinalTestResult").alias("final_test_result"),
            F.col("TestDate").alias("date_tested"),
            F.col("PatientGivenResult").alias("patient_given_result"),
            F.col("FacilityLinked").alias("facility_linked_to"),
            "art_start_date",
            F.col("EverTestedForHiv").alias("ever_tested_for_hiv"),
            F.col("MonthsSinceLastTest").alias("months_since_last_test"),
            F.col("TbScreening").alias("tb_screening"),
            F.col("ClientSelfTested").alias("client_self_tested"),
            F.col("CoupleDiscordant").alias("couple_discordant"),
            F.col("TestType").alias("test_type"),
        )

    return stage


def _dates_enrichment(df: DataFrame) -> DataFrame:
    """HTS_enriching_joined_table (hts_transforms.py:83-91): LinkageDays
    = DATE_DIFF(art_start_date, date_tested, DAY) + YEAR/QUARTER/MONTH
    extracts of both dates."""
    # strict BQ CAST (r10 review: a tolerant .cast("date") silently
    # nulls a malformed date string, misclassifying the patient as
    # 'Not Linked' where the reference's BigQuery CAST fails the job)
    from idr_data_pipelines_spark.functions import bq_cast

    tested = bq_cast(F.col("date_tested"), "DATE")
    art = bq_cast(F.col("art_start_date"), "DATE")
    return df.withColumns(
        {
            "LinkageDays": bq_date_diff(art, tested, "DAY"),
            "date_tested_Year": extract_part(tested, "YEAR"),
            "date_tested_Quarter": extract_part(tested, "QUARTER"),
            "date_tested_Month": extract_part(tested, "MONTH"),
            "art_start_date_Year": extract_part(art, "YEAR"),
            "art_start_date_Quarter": extract_part(art, "QUARTER"),
            "art_start_date_Month": extract_part(art, "MONTH"),
        }
    )


def _entrypoint_1(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "entrypointclean", _recode(F.col("entrypoint"), ENTRYPOINT_RECODE)
    )


def _entrypoint_2(df: DataFrame) -> DataFrame:
    """Collapse all known raw entrypoints to the sentinel "0"."""
    sentinel = {raw: "0" for raw in ENTRYPOINT_RECODE}
    return df.withColumn(
        "entrypointclean2", _recode(F.col("entrypoint"), sentinel)
    )


def _entrypoint_3(df: DataFrame) -> DataFrame:
    """known ("0") → clean name; null → null; unknown → "Other"."""
    return df.withColumn(
        "entrypointclean3",
        F.when(F.col("entrypointclean2") == "0", F.col("entrypointclean"))
        .when(F.col("entrypointclean2").isNull(), F.lit(None))
        .otherwise(F.lit("Other")),
    )


def hts_cascade_expr() -> Column:
    """hts_cascade CASE (hts_transforms.py:189-202): linkage-delay
    buckets among positives; no ELSE → non-positives stay NULL."""
    pos = F.col("final_test_result") == "Positive"
    days = F.col("LinkageDays")
    return case_bucket(
        days,
        [
            ((days == 0) & pos, F.lit("Same Day")),
            ((days > 0) & (days < 15) & pos, F.lit(">1 day <2 weeks")),
            ((days > 14) & pos, F.lit(">2 weeks")),
            ((days < 0) & pos, F.lit("Clerical Error")),
            (days.isNull() & pos, F.lit("Not Linked")),
        ],
    )


def _summary_1(df: DataFrame) -> DataFrame:
    """HTS_summary (hts_transforms.py:186-212): derive cascade, keep
    non-null rows."""
    return filter_derived(df, "hts_cascade", hts_cascade_expr())


def hts_summary(df: DataFrame) -> DataFrame:
    """HTS_warehouse_summary (hts_transforms.py:214-232): global
    conditional-count pivot over the cascade buckets."""
    c = F.col("hts_cascade")
    return agg_pivot_sum_case(
        df,
        {
            "totalPositive": c.isNotNull(),
            "sameDay": c == "Same Day",
            "oneDayToTwoWeeks": c == ">1 day <2 weeks",
            "moreThanTwoWeeks": c == ">2 weeks",
            "clericalError": c == "Clerical Error",
            "notLinked": c == "Not Linked",
        },
    )


def build_hts_pipeline(catalog: Catalog) -> Pipeline:
    p = Pipeline(
        "hts",
        source=lambda spark: catalog.table("hts_staging"),
        depends_on=["idr_load"],
    )
    p.stage("deduplicate_HTS", dedup_distinct)
    p.stage("HTS_joining_MFL_Codes", _join_mfl(catalog))
    p.stage("HTS_enriching_joined_table", _dates_enrichment)
    p.stage("HTS_enriching_entrypoint", _entrypoint_1)
    p.stage("HTS_enriching_entrypoint_2", _entrypoint_2)
    p.stage("HTS_enriching_entrypoint_3", _entrypoint_3)
    p.stage("HTS_data_warehouse")  # identity → warehouse.hts
    p.stage("HTS_summary", _summary_1)
    p.stage("HTS_warehouse_summary", hts_summary)
    p.stage("finish_pipeline")
    return p
