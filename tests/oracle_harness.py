"""Local mirror of the driver's DuckDB-oracle differential check.

Runs a Spark query and its DuckDB oracle on the same parquet tables,
then compares row count, column-name schema, and a DRIVER-FAITHFUL
canonical value hash. The value path deliberately reproduces the
driver's pandas canonicalization, not a numerically tolerant compare:

- both results become pandas frames (``toPandas()`` / duckdb
  ``.df()``), so engine→pandas dtype coercions (DuckDB HUGEINT →
  float64, nullable int → float64) are visible exactly as the driver
  sees them;
- columns sort by name, rows sort by ALL columns via pandas
  ``sort_values`` — whose per-column factorize step raises
  ``TypeError: unhashable type`` on array/struct cells, exactly the
  driver ``err`` mode r07 hit on ``emb_random_project``;
- every cell is stringified per its pandas dtype before hashing, so
  ``5`` (int64) vs ``5.0`` (float64) MISMATCH — the driver failure
  mode r07 hit on ``text_shared_ngrams`` — even though they compare
  numerically equal.

r07 proved local-green ≠ driver-green when the local compare is more
forgiving than the driver's representation hash; this harness is
strictly at-least-as-picky, so oracle dtype drift and unhashable
output shapes fail in CI before they burn a driver window slot. Used
by tests/test_oracle_parity.py.
"""

from __future__ import annotations

import hashlib
from datetime import date, datetime

import duckdb
import pandas as pd

from idr_data_pipelines_spark.driver_contract import create_views


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # bound DuckDB hard: its buffer manager allocates 256 KB blocks
    # that glibc serves as one mmap each, so a transient multi-GB
    # spike costs tens of thousands of memory mappings and races the
    # kernel's vm.max_map_count (65530 here). Crossing it makes
    # unrelated 16 KB mallocs and pthread_create fail process-wide
    # ("bad allocation" / "can't start new thread" — both observed in
    # long suite runs). The largest sf0.01 oracle peaks under 1 GB, so
    # 4 GB (≈16k blocks) keeps the whole process far from the map
    # limit; 8 threads bounds the number of concurrently-buffering
    # operators for the same reason.
    con.execute("SET memory_limit='4GB'")
    con.execute("SET threads=8")
    create_views(con, sf_dir)
    return con


def canonical_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonicalization: columns sorted by name, rows
    sorted by every column. Multi-column ``sort_values`` factorizes
    each column through a hash table, so an array/struct/map cell
    raises ``TypeError: unhashable type: 'list'`` here — the same
    point the driver dies, which is the point: such schemas must fail
    locally too."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf.columns) and len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def _cell_str(v: object) -> str:
    """Dtype-faithful cell rendering: no numeric normalization, so an
    int64 5 and a float64 5.0 render differently (as they do in the
    driver's representation hash — r07 ``text_shared_ngrams`` failed
    on exactly that while every numeric value was equal). Two
    deliberate normalizations, calibrated against driver history:

    - null flavors (None / NaN / NaT) collapse to one token. ADVICE
      r08 asked for NaN to render distinctly unless there was
      evidence the driver also collapses them; the evidence exists
      and is specific: ``evt_anomaly_stream``'s boolean ``anomaly``
      column reaches pandas as object-dtype ``None`` from Spark but
      object-dtype float ``NaN`` from DuckDB ``.df()`` on the 6
      zero-variance rows at sf0.01, and the driver hash-matched that
      exact frame in r07 (CORRECTNESS_r07, 150 rows, hash_match
      true). A distinct-NaN token here false-fails that green query
      (measured: re-splitting the tokens flipped only
      evt_anomaly_stream across the whole 266-oracle registry);
    - date/datetime-likes render as one canonical timestamp string:
      Spark DATE reaches pandas as ``datetime.date`` objects while
      DuckDB DATE arrives as ``datetime64[us]``, and every
      date-emitting query the driver has hashed is green (r04/r06),
      so the driver demonstrably does NOT distinguish these two
      renderings. Without this, the harness would false-fail ~every
      date column.
    """
    isna = pd.isna(v)
    if isna is True:
        return "NULL"
    if isinstance(v, (pd.Timestamp, datetime, date)):
        return str(pd.Timestamp(v))
    return str(v)


def frame_rows(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    """Canonicalized, stringified rows (column-sorted, row-sorted)."""
    canon = canonical_frame(pdf)
    return [
        tuple(_cell_str(v) for v in row)
        for row in canon.itertuples(index=False, name=None)
    ]


def driver_hash(pdf: pd.DataFrame) -> str:
    """Order-insensitive representation hash of a result frame, as
    the driver computes it: canonical frame → stringified rows →
    md5 over the row stream."""
    h = hashlib.md5()
    for row in frame_rows(pdf):
        h.update(("\x1f".join(row) + "\x1e").encode("utf-8"))
    return h.hexdigest()


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_pdf = spark_df.toPandas()
    # re-assert the calibrated cap between compares. Since the r10
    # self-cap policy every oracle's own SQL immediately re-SETs 2GB,
    # so for registry oracles this line is a no-op by the time the
    # query runs — it remains load-bearing for ad-hoc SQL passed to
    # compare() without an embedded cap (goldens, experiments)
    con.execute("SET memory_limit='4GB'")
    d_pdf = con.execute(sql).df()
    s_cols = list(s_pdf.columns)
    d_cols = list(d_pdf.columns)

    result = {
        "rows_spark": len(s_pdf),
        "rows_oracle": len(d_pdf),
        "cols_spark": sorted(s_cols),
        "cols_oracle": sorted(d_cols),
        "rowcount_match": len(s_pdf) == len(d_pdf),
        "schema_match": sorted(s_cols) == sorted(d_cols),
        "values_match": False,
        "first_diff": None,
    }
    if not (result["rowcount_match"] and result["schema_match"]):
        return result
    try:
        a = frame_rows(s_pdf)
        b = frame_rows(d_pdf)
    except TypeError as e:
        # unhashable array/struct cell — the driver records this as an
        # err row; surface it as a value mismatch with the cause
        result["first_diff"] = {"canonicalize_error": repr(e)}
        return result
    if a == b:
        result["values_match"] = True
        return result
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            result["first_diff"] = {"row": i, "spark": ra, "oracle": rb}
            break
    return result
