"""CSV / JSON-lines directory sources.

Reference parity (cites relative to /root/reference/): the reference's
load operator passes BigQuery CSV options even for parquet loads —
``skip_leading_rows=1`` and ``allow_quoted_newlines=True``
(idr_pipeline_from_server/dags/idr_load.py:90-91) — so a user pointing
the pipeline at CSV extracts hits this surface immediately. The
BigQuery options map onto the Spark CSV datasource:

- ``skip_leading_rows=1`` + autodetect ≙ ``header=true`` (the skipped
  row names the columns); ``0`` ≙ ``header=false``.
- ``allow_quoted_newlines`` ≙ ``multiLine=true`` (fields may contain
  embedded record delimiters inside quotes).
- BigQuery autodetect ≙ ``inferSchema=true`` (or an explicit schema).

``read_csv_all_string`` mirrors the reference's pandas staging path
(deps/parquet_solution.py:13-84) for CSV: every column lands as string
(the CSV reader's native behavior without inference), the literal
``"None"`` sentinel is normalized to null, and exact duplicates can be
dropped — all distributed, nothing on the driver.

Scale notes: CSV with ``multiLine=true`` is NOT splittable (a file is
one partition — quoted newlines make record boundaries ambiguous at
arbitrary offsets); many medium files parallelize, one huge file does
not. Plain ``multiLine=false`` CSV and JSON-lines are splittable.
Schema inference is an extra full pass over the data — always pass an
explicit schema at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv_dir(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    skip_leading_rows: int = 1,
    allow_quoted_newlines: bool = True,
    field_delimiter: str = ",",
    quote: str = '"',
    escape: str = '"',
    infer_schema: bool = False,
) -> DataFrame:
    """Load all CSV under ``path`` as one DataFrame, BigQuery-option
    parlance (dags/idr_load.py:90-91).

    Defaults are RFC 4180: ``"``-quoted fields, quotes doubled inside
    quoted fields (``escape='"'``). With neither ``schema`` nor
    ``infer_schema`` every column is a string — the staging-table
    shape the reference loads into.
    """
    if skip_leading_rows not in (0, 1):
        # BigQuery allows skipping arbitrary preamble rows; the Spark
        # CSV reader only distinguishes header/no-header. Supporting
        # N>1 would need a per-file line filter — out of scope until a
        # pipeline needs it.
        raise ValueError("skip_leading_rows must be 0 or 1")
    reader = (
        spark.read.option("header", skip_leading_rows == 1)
        .option("multiLine", allow_quoted_newlines)
        .option("sep", field_delimiter)
        .option("quote", quote)
        .option("escape", escape)
    )
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_csv_all_string(
    spark: SparkSession,
    path: str,
    deduplicate: bool = True,
    none_sentinels: tuple[str, ...] = ("None",),
    **csv_options,
) -> DataFrame:
    """All-string CSV staging ingest — the parquet_solution.py
    semantics (astype(str) + drop_duplicates + "None"→null) applied to
    the CSV surface. Columns are already strings off the reader; the
    sentinel normalize is a projection, the dedup a hash aggregate."""
    df = read_csv_dir(spark, path, schema=None, infer_schema=False, **csv_options)
    df = df.na.replace(list(none_sentinels), None)
    if deduplicate:
        df = df.distinct()
    return df


def read_json_dir(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    multiline: bool = False,
) -> DataFrame:
    """Load all JSON under ``path`` as one DataFrame.

    ``multiline=False`` (default) is JSON-lines — one record per line,
    splittable, the only JSON layout that scales; ``multiline=True``
    parses whole-file JSON documents (one partition per file). Without
    an explicit ``schema``, inference costs an extra full pass.
    """
    reader = spark.read.option("multiLine", multiline)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_json_with_corrupt_routing(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines ingest that ROUTES malformed lines instead of
    failing (FAILFAST) or silently nulling them (naked PERMISSIVE):
    the returned frame carries ``corrupt_col`` holding the raw text of
    any unparseable line, null for good rows — callers split on it to
    quarantine bad records while the pipeline keeps flowing, the
    standard dead-letter pattern for 100 TB ingest where one corrupt
    shard must not kill the job.

    The schema must NOT declare ``corrupt_col`` itself; it is appended
    here. Note the Spark caveat: a query that selects ONLY the corrupt
    column forces a re-parse — always project it alongside real
    columns (as the catalog query does).
    """
    from pyspark.sql.types import StringType, StructType

    base = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    full = StructType(list(base.fields)).add(corrupt_col, StringType())
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def read_text_lines(
    spark: SparkSession,
    path: str,
) -> DataFrame:
    """Plain-text line source (``spark.read.text``): one ``value``
    row per line — the rawest corpus format (one document per line,
    the common crawl-dump/exported-corpus shape). Splittable per line
    for uncompressed files; at scale prefer many medium files or a
    splittable codec so the scan parallelizes."""
    return spark.read.text(path)


def write_text_lines(df: DataFrame, col: str, path: str) -> None:
    """Write a single string column as plain-text lines (one row per
    line). The column must not contain newlines — Spark's text writer
    would silently split such a row into multiple lines on read-back —
    and must not contain NULLs: the writer emits a null row as an
    EMPTY LINE (r10 review, execution-confirmed), so null and
    empty-string documents become indistinguishable on read-back.
    Raise-by-construction is the caller's job (filter or escape
    first)."""
    df.select(F.col(col).cast("string").alias("value")).write.mode(
        "overwrite"
    ).text(path)
