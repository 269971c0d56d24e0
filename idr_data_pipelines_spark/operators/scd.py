"""Slowly-changing-dimension (SCD type 2) history building.

The reference's warehouse keeps only latest-state tables (group-max /
latest-per-key dedup, SURVEY.md §2.2); a real warehouse also needs the
inverse — the full change history with validity intervals. Both
operators here are pure window compositions (no iteration, no state),
so they are exactly SQL-expressible and oracle-checked, and at scale
they cost one hash shuffle on the business key.

``scd2_from_events`` builds the history from an event log (the shape a
CDC feed or the reference's daily extracts produce): collapse
consecutive rows whose tracked attributes did not change, then derive
``valid_from``/``valid_to``/``is_current`` per key.

``scd2_merge`` applies one batch of updates (latest state per key) to
an existing history — the incremental form that avoids reprocessing
the full event log every load: close changed current rows, open new
ones, insert new keys, pass everything else through untouched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_events(
    df: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Event log → SCD2 history: one row per (key, attribute-state
    run), valid from the first event of the run until the next change
    (``valid_to`` NULL ⇒ still current).

    Change detection compares every tracked attribute against its
    predecessor with null-safe equality (``eqNullSafe`` — a NULL→value
    or value→NULL transition IS a change; plain ``=`` would silently
    drop it). Ties on ``ts_col`` are broken by the attribute tuple so
    the run assignment is deterministic.

    Plan: two stacked windows over the same (key × ts) ordering — one
    hash shuffle, one sort, both windows evaluated in a single Window
    node chain; no join, no second pass over the data.
    """
    from idr_data_pipelines_spark.operators.joins import _reserve

    _reserve("__new_run", "scd2_from_events", df)
    _reserve("__run_id", "scd2_from_events", df)
    order = [F.col(ts_col).asc()] + [F.col(c).asc_nulls_first() for c in attr_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)

    changed: Column = F.lit(False)
    for c in attr_cols:
        prev = F.lag(F.col(c)).over(w)
        changed = changed | ~F.col(c).eqNullSafe(prev)
    # the first row of each key has lag()=NULL for every attribute:
    # eqNullSafe makes a genuinely-NULL first attribute look unchanged,
    # so force row_number()==1 to open a run
    first_row = F.row_number().over(w) == 1
    starts = df.withColumn("__new_run", first_row | changed)

    runs = starts.withColumn(
        "__run_id", F.sum(F.col("__new_run").cast("int")).over(w)
    )
    # one row per run: earliest ts opens the validity interval
    per_run = runs.groupBy(*key_cols, "__run_id", *attr_cols).agg(
        F.min(ts_col).alias(valid_from_col)
    )
    w_runs = Window.partitionBy(*key_cols).orderBy(F.col("__run_id").asc())
    return (
        per_run.withColumn(
            valid_to_col, F.lead(F.col(valid_from_col)).over(w_runs)
        )
        .withColumn(current_col, F.col(valid_to_col).isNull())
        .drop("__run_id")
    )


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Apply a batch of updates (at most one row per key, with its
    effective timestamp in ``ts_col``) to an SCD2 ``history``:

    - current row whose attributes changed → closed (``valid_to`` =
      update ts) plus a new open row with the new attributes;
    - current row with no update, or an update equal to the current
      state (null-safe comparison) → passed through untouched;
    - update for an unseen key → new open row;
    - non-current history rows → passed through untouched.

    Scale shape: ONE full-outer hash join on the business key, then a
    single pass that emits 0–2 output rows per joined row via a
    filtered struct-array explode — no second join, no re-read of the
    join output per output class (a naive keep/close/open 3-way union
    would recompute the join three times or force a cache). Updates
    feeds typically fit broadcast; Spark picks that automatically when
    sized so.

    Update timestamps are assumed monotone (newer than the open row's
    ``valid_from``) — the normal shape of a daily/hourly batch feed.
    """
    # null-safe current split (r10 review: filter(col) and filter(~col)
    # BOTH exclude NULL — a nullable is_current written as NULL for
    # 'closed' silently vanished from the merge; NULL routes to the
    # history/pass-through side, the only reading that loses no rows)
    from idr_data_pipelines_spark.operators.joins import _reserve

    _reserve("__in_cur", "scd2_merge", history)
    is_cur = F.coalesce(F.col(current_col), F.lit(False))
    cur = history.filter(is_cur).withColumn("__in_cur", F.lit(True))
    old = history.filter(~is_cur)

    upd = updates.select(
        *key_cols,
        *[F.col(a).alias(f"__new_{a}") for a in attr_cols],
        F.col(ts_col).alias("__eff"),
        F.lit(True).alias("__in_upd"),
    )
    j = cur.join(upd, key_cols, "full_outer")

    # presence via EXPLICIT markers, not value nullness (r09 review:
    # the old `valid_from IS NOT NULL` / `__eff IS NOT NULL` probes
    # silently DROPPED a current row whose valid_from was null
    # ("since forever" histories, scd2_from_events over all-null ts)
    # and discarded updates with a null effective ts — the
    # snapshot_diff/scd3_update marker discipline, applied here too)
    cur_present = F.col("__in_cur").isNotNull()
    upd_present = F.col("__in_upd").isNotNull()
    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.col(f"__new_{a}"))

    ts_type = updates.schema[ts_col].dataType
    out_cols = [*key_cols, *attr_cols, valid_from_col, valid_to_col, current_col]

    def emit(attrs_from_update: bool, vf: Column, vt: Column, cur_flag: Column) -> list[Column]:
        attrs = [
            (F.col(f"__new_{a}") if attrs_from_update else F.col(a)).alias(a)
            for a in attr_cols
        ]
        return [*[F.col(k).alias(k) for k in key_cols], *attrs,
                vf.alias(valid_from_col), vt.alias(valid_to_col),
                cur_flag.alias(current_col)]

    keep_s = F.when(
        cur_present & (~upd_present | ~changed),
        F.struct(*emit(False, F.col(valid_from_col), F.col(valid_to_col), F.lit(True))),
    )
    closed_s = F.when(
        cur_present & upd_present & changed,
        F.struct(*emit(False, F.col(valid_from_col), F.col("__eff"), F.lit(False))),
    )
    new_s = F.when(
        upd_present & (~cur_present | changed),
        F.struct(*emit(True, F.col("__eff"), F.lit(None).cast(ts_type), F.lit(True))),
    )
    rows = F.filter(F.array(keep_s, closed_s, new_s), lambda x: x.isNotNull())
    merged = j.select(F.explode(rows).alias("r")).select("r.*")
    return old.select(*out_cols).unionByName(merged)


def scd1_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """SCD type-1 merge (keyed upsert, no history): update rows replace
    base rows with the same key, unmatched base rows pass through —
    ``MERGE INTO ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`` for
    a full-refresh write path. One anti join (hash, broadcast when
    updates is small) + a shuffle-free union; columns taken from
    ``base``'s schema order."""
    cols = base.columns
    kept = base.join(updates.select(*key_cols), key_cols, "left_anti")
    return kept.select(*cols).unionByName(updates.select(*cols))


def scd3_update(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    prev_prefix: str = "prev_",
) -> DataFrame:
    """SCD type-3 merge: bounded history IN COLUMNS — each tracked
    attribute keeps exactly one prior value (``prev_<col>``), updated
    only when the incoming value actually differs (an update restating
    the current value does NOT clobber the remembered prior one;
    null-safe comparison). Unmatched base rows pass through; brand-new
    keys arrive with null ``prev_`` columns (and null non-tracked
    columns — updates carry only keys + tracked attributes; route
    full-row inserts through ``scd1_upsert`` first if that matters).
    A legitimately-null incoming value is still a real update (the
    match marker is explicit, not value-based). Like ``scd2_merge``,
    ``updates`` must be LATEST STATE PER KEY — duplicate keys would
    fan the dimension out through the join; pre-collapse with
    ``dedup_latest_per_key``.

    The type-2 alternative (row-per-version, ``scd2_merge``) is the
    full history; type 3 is what dashboard schemas use when only
    "current vs previous" matters and table width is the budget. One
    outer hash join on the key (broadcast when the update batch is
    small), zero extra shuffles.
    """
    for c in tracked_cols:
        if f"{prev_prefix}{c}" not in base.columns:
            raise ValueError(
                f"base must already carry {prev_prefix}{c} (initialize "
                "with null columns on first load)"
            )
    u = updates.select(
        *key_cols,
        *[F.col(c).alias(f"__u_{c}") for c in tracked_cols],
        F.lit(1).alias("__matched"),
    )
    j = base.join(u, key_cols, "full_outer")
    out_cols: list[Column] = [F.col(c) for c in key_cols]
    matched = F.col("__matched").isNotNull()
    for c in base.columns:
        if c in key_cols:
            continue
        if c in tracked_cols:
            changed = ~F.col(f"__u_{c}").eqNullSafe(F.col(c))
            out_cols.append(
                F.when(
                    matched & changed, F.col(f"__u_{c}")
                ).otherwise(F.col(c)).alias(c)
            )
        elif c.startswith(prev_prefix) and c[len(prev_prefix):] in tracked_cols:
            t = c[len(prev_prefix):]
            changed = ~F.col(f"__u_{t}").eqNullSafe(F.col(t))
            out_cols.append(
                F.when(matched & changed, F.col(t)).otherwise(F.col(c)).alias(c)
            )
        else:
            out_cols.append(F.col(c))
    return j.select(*out_cols)


def scd4_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
) -> tuple[DataFrame, DataFrame]:
    """SCD type-4 merge: current table + separate history table. Rows
    of ``base`` whose key appears in ``updates`` move to the history
    table verbatim (the displaced version); the new current table is
    the type-1 upsert. Returns ``(current, history)``.

    Like the other SCD merges, ``updates`` must be latest-state-per-key
    (pre-collapse with ``dedup_latest_per_key``). One semi join + one
    anti join on the key — both broadcast when the update batch is
    small — and no extra shuffles; at warehouse scale the history side
    is an APPEND-ONLY sink (``sink_rows_append``), so a daily merge
    writes only the displaced rows, never rewriting accumulated
    history."""
    cols = base.columns
    history = base.join(updates.select(*key_cols), key_cols, "left_semi")
    current = (
        base.join(updates.select(*key_cols), key_cols, "left_anti")
        .select(*cols)
        .unionByName(updates.select(*cols))
    )
    return current, history.select(*cols)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    change_col: str = "change",
) -> DataFrame:
    """Batch CDC: diff two snapshots of the same table into
    inserted / deleted / updated / unchanged rows, keyed on
    ``key_cols``. Row equality is a null-safe comparison of every
    non-key column, computed inside ONE full-outer hash join — no
    second scan, no row-serialization hashing (the comparison stays
    codegen'd column equality).

    Output = the NEW side's columns (the OLD side's for deletes) plus
    ``change``. This is the "what did yesterday's load change"
    primitive: feed the inserted+updated slice to an SCD merge or an
    incremental aggregate, and alert on unexpected deletes. At scale
    both snapshots shuffle once on the key — or zero times if both
    are bucketed on it (``sink_table_bucketed``).

    Keys join NULL-SAFELY (<=>), so a row whose key contains NULL in
    both snapshots matches itself (plain equality would report it as
    a spurious deleted+inserted pair). A key that exists only as
    NULLs still groups correctly because <=> treats NULL = NULL."""
    for kc in key_cols:
        if kc not in old.columns or kc not in new.columns:
            raise ValueError(f"key column {kc!r} missing from a snapshot")
    if set(old.columns) != set(new.columns):
        raise ValueError(
            "snapshots must share a schema: "
            f"{sorted(set(old.columns) ^ set(new.columns))} differ"
        )
    if change_col in new.columns:
        raise ValueError(
            f"change_col {change_col!r} collides with a snapshot column — "
            "pass a different change_col"
        )
    val_cols = [c for c in new.columns if c not in key_cols]
    o = old.select(
        *[F.col(c).alias(f"__o_{c}") for c in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in val_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"__n_{c}") for c in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in val_cols],
        F.lit(1).alias("__in_new"),
    )
    cond = F.lit(True)
    for c in key_cols:
        cond = cond & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    j = o.join(n, cond, "full_outer")
    same = F.lit(True)
    for c in val_cols:
        same = same & F.col(f"__n_{c}").eqNullSafe(F.col(f"__o_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("inserted"))
        .when(F.col("__in_new").isNull(), F.lit("deleted"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("updated"))
    )
    new_side = F.col("__in_new").isNotNull()
    out_keys = [
        F.when(new_side, F.col(f"__n_{c}")).otherwise(F.col(f"__o_{c}")).alias(c)
        for c in key_cols
    ]
    out_vals = [
        F.when(new_side, F.col(f"__n_{c}")).otherwise(F.col(f"__o_{c}")).alias(c)
        for c in val_cols
    ]
    return j.select(*out_keys, *out_vals, change.alias(change_col))
