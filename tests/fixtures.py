"""FIXTURES.md-shaped synthetic inputs for the four extract pipelines.

Small, hand-written rows with every quirk the golden tests assert:
exact duplicates, (SiteCode, CCC) entity duplicates, "None" string
nulls (MMD arrives all-string), entrypoint raw variants, negative /
null linkage days, VL ties and cross-site ccc collisions, LDL
sentinels, high-load-on-Valid gaps, missing vaccine types.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

AS_OF = "2024-06-01"  # injected CURRENT_DATE for all pipeline tests


def mfl_codes(spark: SparkSession):
    rows = [
        (100, "Alpha Clinic", "Nairobi", "Westlands", "Westlands Sub", "Parklands", -1.26, 36.81),
        (101, "Beta Hospital", "Kisumu", "Kisumu East", "Kisumu Sub", "Kolwa", -0.09, 34.77),
        (102, "Gamma Dispensary", "Mombasa", "Nyali", "Nyali Sub", "Frere Town", -4.04, 39.70),
        # 103 intentionally missing from hub_details (inner-join drop)
        (103, "Delta Health Centre", "Nakuru", "Naivasha", "Naivasha Sub", "Hells Gate", -0.71, 36.43),
    ]
    cols = ["SiteCode", "officialname", "county_name", "constituency_name",
            "sub_county_name", "ward_name", "lat", "long"]
    return spark.createDataFrame(rows, cols)


def hub_details(spark: SparkSession):
    return spark.createDataFrame(
        [(100, "Hub A"), (101, "Hub B"), (102, "Hub C")], ["MFL_Code", "Hub"]
    )


def mmd_staging(spark: SparkSession):
    """All-string arrival (parquet_solution.py:75). Two rows for
    (100, CCC001) with different values → group-max dedup merges them;
    one exact duplicate row; 'None' for nulls; a Died row; site 999
    not in MFL (dropped by the inner join)."""
    cols = [
        "DOB", "Gender", "weight", "height", "CCC", "PatientPK", "NationalID",
        "AgeEnrollment", "AgeARTStart", "AgeLastVisit", "SiteCode",
        "FacilityName", "RegistrationDate", "PatientSource",
        "PreviousARTStartDate", "StartARTAtThisFAcility", "StartARTDate",
        "PreviousARTUse", "PreviousARTPurpose", "PreviousARTRegimen",
        "DateLastUsed", "StartRegimen", "StartRegimenLine", "LastARTDate",
        "LastRegimen", "LastRegimenLine", "ExpectedReturn", "LastVisit",
        "Duration", "ExitDate", "ExitReason", "Date_Created",
        "Date_Last_Modified",
    ]

    def row(ccc, site, weight, last_art, last_line, expected_return,
            exit_reason, start_art="2020-01-15", start_line="First line"):
        return (
            "1990-03-05", "Female", weight, "165.0", ccc, "1001", "ID123",
            "30.0", "30.5", "33.0", site,
            "Facility X", "2020-01-10", "Transfer In",
            "None", "2020-01-15", start_art,
            "No", "None", "None",
            "None", "TDF/3TC/DTG", start_line, last_art,
            "TDF/3TC/DTG", last_line, expected_return, "2024-05-01",
            "90.0", "None", exit_reason, "2024-05-01 10:00:00",
            "2024-05-02 11:00:00",
        )

    rows = [
        # entity-dup pair: same (SiteCode, CCC), group-max merges values
        row("CCC001", "100", "61.0", "2024-04-01", "First line", "2024-05-20", "None"),
        row("CCC001", "100", "64.5", "2024-03-01", "Second line", "2024-05-25", "None"),
        # on-treatment patient (ExpectedReturn close to AS_OF → CurrentDays < 31)
        row("CCC002", "101", "70.0", "2024-05-10", "Second line", "2024-05-30", "None"),
        # deceased → LossOfLife=1 → CurrentOnTreatment NO
        row("CCC003", "102", "55.0", "2024-02-01", "Third line", "2024-05-30", "Died"),
        # lapsed (ExpectedReturn long past → CurrentDays >= 31) + odd regimen line
        row("CCC004", "101", "80.0", "2023-01-01", "Some odd line", "2023-02-01", "None"),
        # site not in MFL → dropped at ART_joining_MFL_Codes
        row("CCC005", "999", "66.0", "2024-04-01", "First line", "2024-06-10", "None"),
    ]
    rows.append(rows[2])  # exact duplicate → removed by group-max dedup
    return spark.createDataFrame(rows, cols)


def hts_staging(spark: SparkSession):
    cols = [
        "SiteCode", "CccNumber", "PatientId", "DOB", "Gender", "ageInYears",
        "EntryPoint", "Consent", "ClientTestedAs", "TestStrategy",
        "TestResult1", "TestResult2", "FinalTestResult", "TestDate",
        "PatientGivenResult", "FacilityLinked", "art_start_date",
        "EverTestedForHiv", "MonthsSinceLastTest", "TbScreening",
        "ClientSelfTested", "CoupleDiscordant", "TestType",
    ]

    def row(pid, entry, final, test_date, art_date, site="100"):
        return (site, f"C{pid}", pid, "1985-07-01", "Male", 39,
                entry, "Yes", "Self", "HP", "Positive", "None", final,
                test_date, "Yes", "Facility X", art_date,
                "Yes", "12", "Negative", "No", "No", "Initial")

    rows = [
        row("P1", "CCC (comprehensive care center)", "Positive", "2024-01-10", "2024-01-10"),  # Same Day
        row("P2", "Out Patient Department(OPD)", "Positive", "2024-01-10", "2024-01-15"),      # >1d <2w
        row("P3", "VCT", "Positive", "2024-01-10", "2024-02-20"),                              # >2 weeks
        row("P4", "PMTCT MAT", "Positive", "2024-01-10", "2024-01-05"),                        # Clerical Error
        row("P5", "Walk-in kiosk", "Positive", "2024-01-10", None),                            # Not Linked + unknown entrypoint
        row("P6", None, "Negative", "2024-01-10", None),                                       # null entrypoint, not positive
        row("P7", "INPATIENT CARE OR HOSPITALIZATION", "Negative", "2024-01-12", None),
    ]
    rows.append(rows[0])  # exact duplicate
    return spark.createDataFrame(rows, cols)


def vls_staging(spark: SparkSession):
    cols = ["Mfl_code", "ccc_number", "Gender", "DOB", "ageInYears",
            "date_test_requested", "date_test_result_received", "lab_test",
            "urgency", "order_reason", "test_result"]

    def row(mfl, ccc, received, result, lab="VIRAL LOAD"):
        return (mfl, ccc, "Female", "1990-03-05", 34,
                "2024-01-01", received, lab, "Routine", "Annual", result)

    rows = [
        # CCC001: two results; latest (2024-03-10) wins; LDL decode
        row(100, "CCC001", "2024-01-10", "1500"),
        row(100, "CCC001", "2024-03-10", "LDL"),
        # CCC002: tie on max date → fan-out (both rows survive join-back)
        row(101, "CCC002", "2024-02-01", "500"),
        row(101, "CCC002", "2024-02-01", "800"),
        # CCC003: high load, patient deceased → Invalid → Unsuppressed
        row(102, "CCC003", "2024-04-01", "250000"),
        # CCC004: old result on lapsed patient → Invalid; load < 1000 → CASE gap → NULL suppression
        row(101, "CCC004", "2022-01-01", "400"),
        # null keys → dropped by denullification
        row(None, "CCC009", "2024-01-01", "100"),
        row(100, None, "2024-01-01", "100"),
        # non-viral-load test → dropped by filter
        row(100, "CCC001", "2024-05-01", "7.5", lab="CD4"),
    ]
    rows.append(rows[0])  # exact duplicate
    return spark.createDataFrame(rows, cols)


def covid_staging(spark: SparkSession):
    cols = ["MFL_code", "Facilty_Name", "ccc_number", "phone_number",
            "id_number", "DOB", "ageInYears", "Gender", "visit_date",
            "Ever_Vaccinated", "First_Vaccine", "First_Vaccination_Verified",
            "first_dose_date", "Second_Vaccine", "Second_Vaccination_Verified",
            "second_dose_date", "Final_Vaccination_Status",
            "Ever_recieved_Booster", "Booster_Vaccine"]

    def row(ccc, first, second, status, booster_flag, booster, site="100"):
        return (site, "Facility X (raw)", ccc, "0700000000", "ID9", "1990-03-05",
                34, "Female", "2024-04-01", "Yes", first, "Yes", "2021-03-01",
                second, "Yes", "2021-06-01", status, booster_flag, booster)

    rows = [
        row("CCC001", "AstraZeneca", "AstraZeneca", "Fully Vaccinated", "Yes", "Pfizer"),  # → Booster Shot
        row("CCC002", "Moderna", None, "Partially Vaccinated", "No", None),               # nulls → Unknown types
        row("CCC003", None, None, "Not Vaccinated", "No", None),
        row("CCC004", "Pfizer", "Pfizer", "Fully Vaccinated", "No", None),                # stays Fully Vaccinated
        row("CCC005", "Sinopharm", "Sinopharm", "Fully Vaccinated", "Yes", "Moderna", site="999"),  # site not in MFL
    ]
    rows.append(rows[3])  # exact duplicate
    return spark.createDataFrame(rows, cols)


def load_catalog(spark: SparkSession):
    from idr_data_pipelines_spark.sources import Catalog

    cat = Catalog(spark)
    cat.register("mfl_codes", mfl_codes(spark))
    cat.register("hub_details", hub_details(spark))
    cat.register("mmd_staging", mmd_staging(spark))
    cat.register("hts_staging", hts_staging(spark))
    cat.register("vls_staging", vls_staging(spark))
    cat.register("covid_staging", covid_staging(spark))
    return cat
