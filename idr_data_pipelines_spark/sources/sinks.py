"""Table sinks.

Reference parity:

- ``sink_table_overwrite`` ≙ ``write_disposition='WRITE_TRUNCATE'`` used
  by every transform task (e.g. idr_pipeline_from_server/dags/
  covid_transforms.py:48-50) and by the pandas loader's
  ``LoadJobConfig(write_disposition="WRITE_TRUNCATE")``
  (dags/dependencies/parquet_solution.py:87-125).
- ``sink_rows_append`` ≙ the Cloud Function's streaming insert of event
  payloads into the audit table (cloud_function/main.py:34-47).

Scale note: a full-table overwrite of a 100 TB output is the
reference's model (full refresh every run). When ``partition_by`` is
given we write a partitioned table and rely on
``spark.sql.sources.partitionOverwriteMode=dynamic`` (set in
session.py) so a run that only produces some partitions replaces only
those — the honest WRITE_TRUNCATE-at-scale story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def sink_table_overwrite(
    df: DataFrame,
    table: str,
    partition_by: list[str] | None = None,
) -> None:
    """Replace ``table``'s contents with ``df`` (WRITE_TRUNCATE)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(table)


def sink_rows_append(df: DataFrame, table: str) -> None:
    """Append rows to ``table`` (audit-insert semantics)."""
    df.write.mode("append").saveAsTable(table)


def sink_table_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``table`` bucketed (and optionally sorted) by the join/agg
    key — the co-located-join path.

    Two tables bucketed by the same key with the same bucket count
    join WITHOUT a shuffle: each task reads matching bucket files from
    both sides. At 100 TB this turns the fact⋈fact merge (the
    reference's ART⋈VLS join, dags/vls_transforms.py:132-155) from a
    full two-sided exchange into a local join; sortBy additionally
    removes the sort for sort-merge. Bucket count should be chosen so
    a single bucket ≲ a few hundred MB at the target scale.

    Self-healing overwrite: ``saveAsTable(mode="overwrite")`` refuses a
    managed location left behind by a previous session whose catalog
    entry is GONE (LOCATION_ALREADY_EXISTS). The heal targets exactly
    that orphan case: the warehouse directory is force-removed ONLY
    when no catalog entry exists for ``table`` — a live catalog entry
    (managed or external) is left to ``mode("overwrite")``'s own
    semantics, so external-table data is never destroyed by the heal.
    The cleanup uses the Hadoop FileSystem via the JVM gateway
    (classic deployments only, like ``compact_parquet_dir``) and only
    for unqualified default-database names — a qualified ``db.tbl``
    lives under ``db.db/`` and is skipped rather than guessed at.
    """
    spark = df.sparkSession
    if not spark.catalog.tableExists(table) and "." not in table:
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        wh = spark.conf.get("spark.sql.warehouse.dir")
        loc = jvm.org.apache.hadoop.fs.Path(
            wh.rstrip("/") + "/" + table.lower()
        )
        fs = loc.getFileSystem(conf)
        if fs.exists(loc):
            fs.delete(loc, True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def sink_parquet_overwrite(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
) -> None:
    """Replace a parquet directory with ``df`` (lake-side TRUNCATE)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def compact_parquet_dir(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 1,
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ⌈total_bytes / target_file_bytes⌉ files (HDFS/S3 list + open
    overhead makes thousands of KB-sized files a real scan bottleneck;
    streaming sinks and per-stage materialization produce exactly
    that).

    Sizing reads the file listing only (no data scan); the rewrite is
    one job with a write-to-temp-then-swap so a failed compaction never
    corrupts the directory. Returns the output file count.

    At warehouse scale run this per partition directory (compact the
    partitions the last load touched, not the whole table).

    Classic-deployment-only: the swap needs Hadoop FileSystem rename
    via the JVM gateway, which Spark Connect does not expose.
    """
    import math

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    total = fs.getContentSummary(p).getLength()
    n_files = max(min_files, math.ceil(total / max(target_file_bytes, 1)))

    tmp = path.rstrip("/") + "__compact_tmp"
    tmp_p = jvm.org.apache.hadoop.fs.Path(tmp)
    bak = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__compact_bak")
    # fail fast on leftovers from a previously crashed compaction:
    # FileSystem.rename returns false (not raises) on conflict, so a
    # stale bak/tmp would otherwise make the swap silently no-op
    if fs.exists(bak):
        raise RuntimeError(
            f"stale backup {bak} exists — a prior compaction crashed "
            "mid-swap; recover it (rename back or delete) before compacting"
        )
    if fs.exists(tmp_p):
        fs.delete(tmp_p, True)  # orphaned temp output is safe to drop

    df = spark.read.parquet(path)
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    if not fs.rename(p, bak):
        raise RuntimeError(f"compaction swap failed: rename {p} -> {bak}")
    if not fs.rename(tmp_p, p):
        # restore the original before failing so the directory is intact
        fs.rename(bak, p)
        raise RuntimeError(f"compaction swap failed: rename {tmp_p} -> {p}")
    fs.delete(bak, True)
    out = [f for f in fs.listStatus(p) if f.getPath().getName().endswith(".parquet")]
    return len(out)


def sink_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    order_col: str,
    id_col: str = "example_id",
) -> None:
    """Export a training corpus as ``n_shards`` balanced parquet shards
    with contiguous global example ids in a deterministic order.

    Ids come from ``assign_global_ids`` (range shuffle + broadcast
    prefix sums — no global window); shard = id % n_shards, so shard
    sizes balance to ±1 AND every shard is a uniform round-robin slice
    of the global order (each shard an unbiased sample — what data
    loaders assume when they stripe shards across workers). One file
    per shard via a shard-keyed repartition feeding a partitioned
    write. For shuffled training order, pass a deterministic hash
    column (e.g. ``md5(doc_id)``) as ``order_col``; re-runs then
    reproduce byte-identical shards.

    100 TB shape: the only data movements are the one range shuffle
    inside the id assignment and the shard repartition; n_shards
    should be chosen so one shard ≈ a few hundred MB.
    """
    from pyspark.sql import functions as F

    from idr_data_pipelines_spark.llmdata.sampling import assign_global_ids

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    ids = assign_global_ids(df, order_col, id_col=id_col)
    sharded = ids.withColumn(
        "shard", (F.col(id_col) % n_shards).cast("int")
    )
    (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def sink_parquet_with_manifest(
    df: DataFrame,
    path: str,
    stat_cols: list[str] | None = None,
) -> dict:
    """Write parquet and a ``_manifest.json`` audit next to it — row
    count plus per-column null-count/min/max — computed by an
    ``Observation`` attached to the SAME write pass: the stats ride
    the one data scan the write already does, instead of a second
    read-back aggregation over what was just written (at 100 TB that
    second pass is real money). Returns the manifest dict.

    The manifest is what downstream loaders check before consuming
    (did the expected row count land? did a column go all-null?) —
    the lake-side analogue of the reference's post-load BigQuery row
    checks.
    """
    import json
    import os

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    stat_cols = stat_cols or []
    aggs = [F.count(F.lit(1)).alias("rows")]
    for c in stat_cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.min(c).alias(f"{c}__min"))
        aggs.append(F.max(c).alias(f"{c}__max"))
    obs = Observation(f"manifest_{os.path.basename(path)}")
    df.observe(obs, *aggs).write.mode("overwrite").parquet(path)
    metrics = dict(obs.get)
    manifest = {"rows": metrics["rows"], "columns": {}}
    for c in stat_cols:
        manifest["columns"][c] = {
            "nulls": metrics[f"{c}__nulls"],
            "min": metrics[f"{c}__min"],
            "max": metrics[f"{c}__max"],
        }
    # write through the Hadoop FileSystem, not a local open(): the
    # parquet just landed on whatever filesystem `path` names (s3a://,
    # hdfs://, gs://, file:), and a local open() would fail AFTER the
    # expensive data write on any non-local scheme (r09 review). Same
    # JVM-gateway pattern as compact_parquet_dir (classic deployments).
    body = json.dumps(manifest, indent=2, default=str)
    sc = df.sparkSession.sparkContext
    jvm = sc._jvm
    p = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/_manifest.json")
    fs = p.getFileSystem(sc._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    try:
        out.write(bytearray(body.encode("utf-8")))
    finally:
        out.close()
    return manifest
