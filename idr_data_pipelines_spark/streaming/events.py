"""Event-stream operators (Structured Streaming).

Reference parity (SURVEY.md §2.8): the reference's streaming surface is
control-plane only — a Pub/Sub streaming-pull drain with a bounded
window (dags/dependencies/receiver.py:1-36), republish to a topic
(dags/dependencies/publisher.py:1-21), and an audit append of event
payloads (cloud_function/main.py:34-47). The Spark-native equivalents:

- ``drain_available_now`` — ``readStream`` + ``Trigger.AvailableNow``:
  process everything currently available, then stop. Exactly the
  reference's "pull for a bounded window, ack, stop" semantics, but
  with checkpointed exactly-once progress instead of a 10 s timer.
- ``republish`` — drain + ``foreachBatch`` append to a destination
  (topic analogue = table/path).

Extensions beyond the reference (north-star brief): watermarked
tumbling-window aggregation (``windowed_event_counts``) and
gap-based sessionization (``sessionize``, batch form using window
functions; the streaming form would use applyInPandasWithState).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _is_missing_path_error(exc: Exception) -> bool:
    """True iff ``exc`` is Spark's missing-input-path AnalysisException.

    Matched on the MESSAGE, not the error-class accessor: Spark 3.4+
    tags the condition ``PATH_NOT_FOUND`` while some DSv2/file-index
    paths still phrase it "Path does not exist", and the message check
    covers both. (This module requires pyspark >= 3.4 regardless —
    the ``pyspark.errors`` import below does not exist earlier — so
    the second pattern is message-format robustness, not an
    old-version compatibility path.)"""
    msg = str(exc)
    return "PATH_NOT_FOUND" in msg or "Path does not exist" in msg


def _drain_foreach_batch(
    spark: SparkSession,
    path: str,
    schema: StructType,
    checkpoint_dir: str,
    apply_fn,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> None:
    """THE availableNow drain: read every currently-available file
    under ``path``, run ``apply_fn(batch_df, batch_id)`` per
    micro-batch via ``foreachBatch``, checkpoint as the ack ledger,
    stop when drained. One definition (r09 review: this block was
    previously copy-pasted across six drains — a fix to the
    reader/trigger plumbing had six places to miss).
    ``max_files_per_trigger`` forces genuinely multiple micro-batches
    under availableNow, which is how the stateful drains exercise
    (and their oracles then prove) batching-independence."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.load(path)
        .writeStream.foreachBatch(apply_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def drain_available_now(
    spark: SparkSession,
    path: str,
    schema: StructType,
    checkpoint_dir: str,
    sink_table: str,
    fmt: str = "parquet",
) -> None:
    """Drain all currently-available files into ``sink_table`` and stop.

    Streaming-pull analogue: new files under ``path`` are the incoming
    messages; the checkpoint is the ack ledger (a message is never
    processed twice, even across restarts — stronger than the
    reference's at-least-once pull loop).
    """
    # foreachBatch (not the memory sink) because only it supports
    # resuming from an existing checkpoint — the ack-ledger semantics
    # this operator exists for. Batches land in a per-drain staging
    # directory (foreachBatch runs on a cloned session, so a temp view
    # registered inside the callback would be invisible to the
    # caller), then surface as a temp view over that directory.
    # Exactly-once across crash-restarts: each batch OVERWRITES its
    # own batch_id-deterministic subdirectory, so a batch replayed
    # after a failure between the write and the checkpoint commit
    # replaces its previous output instead of appending a duplicate.
    out_dir = f"{checkpoint_dir.rstrip('/')}__out/{sink_table}"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    _drain_foreach_batch(spark, path, schema, checkpoint_dir, _sink, fmt)
    # "never wrote anything" (an inbox with zero messages) must yield
    # the empty view; any other read error propagates. Probed by
    # attempting the read and catching PATH_NOT_FOUND — public API
    # only, so it works on any scheme (s3://, hdfs://, file:) AND
    # under Spark Connect, where the private `_jvm`/`_jsc` gateway
    # this used previously does not exist.
    from pyspark.errors import AnalysisException

    try:
        out = (
            spark.read.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(out_dir)
        )
        out.schema  # force datasource resolution (path listing) now
    except AnalysisException as exc:
        # Anything other than a missing output path is a real failure.
        if not _is_missing_path_error(exc):
            raise
        out = spark.createDataFrame([], schema)
    out.createOrReplaceTempView(sink_table)


def republish(
    spark: SparkSession,
    path: str,
    schema: StructType,
    checkpoint_dir: str,
    dest_path: str,
    fmt: str = "parquet",
) -> None:
    """Drain + republish: every available message is published to the
    destination (topic analogue), exactly once, then the query stops.

    Idempotent across crash-restarts: each batch overwrites its own
    batch_id-deterministic subdirectory of ``dest_path``, so a batch
    replayed after a failure between write and checkpoint commit
    replaces its previous output rather than appending a duplicate."""

    def _publish(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{dest_path}/batch={batch_id}")

    _drain_foreach_batch(spark, path, schema, checkpoint_dir, _publish, fmt)


def handle_event(
    spark: SparkSession,
    payload_b64: str,
    audit_table: str,
    runner=None,
    pipelines=None,
    event_time: str | None = None,
    trigger=None,
) -> dict:
    """Event-trigger handler — the Cloud-Function analogue
    (cloud_function/main.py:22-47 + composer2_airflow_rest_api.py:40-67):
    base64-decode the event payload, parse it (literal_eval semantics,
    falling back to a raw wrapper), append it to the audit table, then
    trigger the dependent pipelines.

    Two trigger transports, mirroring the reference's split between
    the Cloud Function and the Composer REST client:

    - ``runner`` + ``pipelines`` — in-process: the PipelineRunner
      executes the dependent pipelines on this SparkSession.
    - ``trigger`` — out-of-process seam: a callable
      ``trigger(pipeline_name, event_dict)`` invoked once per entry of
      ``pipelines`` (or once with ``None`` if no pipelines are named).
      This is where the reference's authenticated ``trigger_dag`` POST
      (composer2_airflow_rest_api.py:40-67) plugs in — an Airflow/
      Databricks-Jobs/cron client supplied by the deployment, kept out
      of the engine so the library has no HTTP/auth dependency.

    ``event_time`` is injected for determinism (the reference stamps
    wall-clock server-side). Returns the parsed event dict.
    """
    import ast
    import base64
    import json

    try:
        raw = base64.b64decode(payload_b64).decode("utf-8")
    except (ValueError, UnicodeDecodeError):
        # binascii.Error (a ValueError) on malformed base64; raw bytes
        # that aren't UTF-8 fail the decode — the never-crash contract
        # below starts at the TRANSPORT layer, not just literal_eval,
        # so both degrade to an audit row wrapping the b64 input
        raw = payload_b64
    try:
        event = ast.literal_eval(raw)
        if not isinstance(event, dict):
            event = {"raw": raw}
    except (ValueError, TypeError, SyntaxError, MemoryError, RecursionError):
        # literal_eval's documented failure modes plus the undocumented
        # ones hostile payloads can reach: deeply-nested literals raise
        # RecursionError, huge ones MemoryError — a malformed event must
        # degrade to the raw-wrapper audit row, never crash the handler.
        event = {"raw": raw}

    try:
        payload_json = json.dumps(event, sort_keys=True, default=repr)
    except TypeError:  # e.g. unsortable mixed-type keys
        payload_json = repr(event)
    audit = spark.createDataFrame(
        [(payload_json, event_time)],
        "payload string, event_time string",
    )
    audit.write.mode("append").saveAsTable(audit_table)

    if runner is not None and pipelines:
        runner.run(spark, pipelines)
    if trigger is not None:
        for name in (pipelines or [None]):
            trigger(getattr(name, "name", name), event)
    return event


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
    streaming: bool | None = None,
) -> DataFrame:
    """Tumbling-window event counts with late-data handling.

    On a streaming DataFrame the watermark bounds state: windows older
    than ``watermark`` are finalized and dropped from the state store —
    this is what makes the aggregation runnable forever on an unbounded
    stream. On a batch DataFrame the same code runs without state
    (watermark is a no-op), so one definition serves both.
    """
    if streaming is None:
        streaming = events.isStreaming
    if streaming:
        events = events.withWatermark(ts_col, watermark)
    keys = [F.window(F.col(ts_col), window_duration).alias("win")] + [
        F.col(c) for c in (group_cols or [])
    ]
    out = events.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_events"))
    return out.select(
        F.col("win.start").alias("window_start"),
        *[F.col(c) for c in (group_cols or [])],
        "n_events",
    )


def dedup_stream_exact(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication on ``key_cols`` with bounded state.

    ``dropDuplicatesWithinWatermark``: a duplicate arriving within the
    watermark of the first occurrence is dropped; state for a key is
    released once the watermark passes it, so state size is
    O(keys per watermark window), not O(all keys ever) — the property
    that makes at-least-once sources (the reference's Pub/Sub redelivery,
    deps/receiver.py) safe to consume forever. On a batch DataFrame
    falls back to plain dropDuplicates (no watermark semantics needed).
    """
    if not events.isStreaming:
        return events.dropDuplicates(key_cols)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def sessionize_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    idle_timeout_minutes: int | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming gap-based sessionization — the stateful form of
    ``sessionize`` (applyInPandasWithState).

    Per-user state holds the one *open* session (start, last event
    time, event count, session sequence number); a micro-batch's
    events are folded into it in timestamp order, and every session
    *closed* by a later event is emitted. The open session stays in
    state across micro-batches — exactly-once session emission without
    re-reading history.

    State-size contract (be precise, this is the 100 TB axis): with
    the default ``idle_timeout_minutes=None`` the state is
    O(distinct users EVER SEEN), not O(active users) — no eviction,
    and a departed user's final session is never emitted. That is the
    right mode for drains and for the oracle below, and wrong for a
    forever-running production stream over a churning key space.
    Passing ``idle_timeout_minutes`` switches to EventTimeTimeout: a
    watermark (``watermark_delay``) is attached to ``ts_col``, and a
    user idle past ``gap_minutes + idle_timeout_minutes`` of event
    time has their open session EMITTED (it is genuinely closed — no
    in-gap event can still arrive once the watermark passed the gap)
    and their state REMOVED. State becomes O(users active within the
    timeout horizon) and every session is eventually emitted exactly
    once.

    Session-key contract (r10, ADVICE r09): eviction erases the
    per-user sequence counter, so a user who returns after a timeout
    would restart at ``session_id=1`` and duplicate earlier keys. In
    timeout mode ``session_id`` is therefore the session's
    ``start_us`` — unique per user by construction (a session
    starting at an already-used microsecond would have merged into
    that session), stable across evictions, and monotonically
    ordered like the sequence it replaces. Only the default
    (no-timeout) mode emits the 1-based per-user sequence, which is
    what the batch-``sessionize`` parity oracle requires.

    Determinism contract (default mode): when events arrive in
    event-time order ACROSS micro-batches (within a batch any order is
    fine — the fold sorts), the emitted rows are precisely "every
    session except each user's currently-open (last) one", with the
    same numbering as batch ``sessionize`` — so a SQL oracle exists
    even though the operator is stateful. In timeout mode the emitted
    set additionally includes timed-out final sessions, whose timing
    depends on watermark advancement (batch boundaries) — parity
    checks should use the default mode. A cross-batch straggler that
    lands within ``gap_minutes`` of the open session's max joins it
    (end time never moves backwards); one older than that is merged
    rather than re-splitting already-emitted sessions.

    Returns (user, session_id, start_us, end_us, n_events) with
    timestamps as epoch-microsecond BIGINTs.
    """
    if gap_minutes <= 0 or (
        idle_timeout_minutes is not None and idle_timeout_minutes <= 0
    ):
        raise ValueError(
            "gap_minutes (and idle_timeout_minutes, if set) must be positive"
        )
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    gap_us = gap_minutes * 60 * 1_000_000
    user_type = events.schema[user_col].dataType
    out_schema = StructType(
        [
            StructField(user_col, user_type),
            StructField("session_id", LongType()),
            StructField("start_us", LongType()),
            StructField("end_us", LongType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("last_us", LongType()),
            StructField("start_us", LongType()),
            StructField("n", LongType()),
            StructField("seq", LongType()),
        ]
    )

    idle_us = (
        idle_timeout_minutes * 60 * 1_000_000
        if idle_timeout_minutes is not None
        else None
    )
    cols = [user_col, "session_id", "start_us", "end_us", "n_events"]

    def fold(key, pdfs, state: "GroupState"):
        if idle_us is not None and state.hasTimedOut:
            # the watermark passed last + gap (+ idle): no event can
            # legally extend this session any more — flush it and free
            # the user's state slot
            last, start, n, seq = state.get
            state.remove()
            # timeout mode keys the session by start_us, not seq —
            # seq restarts at 1 after eviction and would collide
            yield pd.DataFrame([(key[0], start, start, last, n)], columns=cols)
            return
        ts = []
        for pdf in pdfs:
            # null timestamps carry no event-time information — skip
            # them. Arrow surfaces a nullable long column as float64
            # with NaN, so guard both None and NaN (t == t), and cast
            # back to int so state stays LongType-clean.
            ts.extend(
                int(t)
                for t in pdf["__ts_us"].tolist()
                if t is not None and t == t
            )
        ts.sort()
        if not ts and not state.exists:
            # a batch of only null-ts events for an unseen user must
            # not CREATE state: in timeout mode the (None,...) entry
            # would register no timeout (guard below) and never be
            # evicted or emitted — a permanent state leak breaking the
            # documented O(active users) bound (r10 review)
            return
        if state.exists:
            last, start, n, seq = state.get
        else:
            last, start, n, seq = None, None, 0, 0
        closed = []
        for t in ts:
            if last is None:
                seq, start, n = seq + 1, t, 1
            elif t - last > gap_us:
                sid = start if idle_us is not None else seq
                closed.append((key[0], sid, start, last, n))
                seq, start, n = seq + 1, t, 1
            else:
                n += 1
            # max(): an out-of-order event from a later micro-batch
            # that falls inside the open session joins it without
            # dragging its end time backwards (matching what batch
            # sessionize computes for the same rows); events earlier
            # than the open session's start are merged rather than
            # retroactively re-splitting history — bound this with an
            # upstream watermark if stragglers can be arbitrarily old.
            last = t if last is None else max(last, t)
        state.update((last, start, n, seq))
        if idle_us is not None and last is not None:
            # epoch-ms deadline: fires once the WATERMARK (not wall
            # clock) passes it, so replays are deterministic
            state.setTimeoutTimestamp((last + gap_us + idle_us) // 1000)
        yield pd.DataFrame(closed, columns=cols)

    if idle_us is not None:
        events = events.withWatermark(ts_col, watermark_delay)
        # the WATERMARKED column itself must survive the projection —
        # Spark rejects EventTimeTimeout if the event-time attribute
        # was projected away before the stateful operator
        prepped = events.select(
            F.col(user_col),
            F.unix_micros(F.col(ts_col)).alias("__ts_us"),
            F.col(ts_col),
        )
    else:
        prepped = events.select(
            F.col(user_col), F.unix_micros(F.col(ts_col)).alias("__ts_us")
        )
    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if idle_us is not None
        else GroupStateTimeout.NoTimeout
    )
    return prepped.groupBy(user_col).applyInPandasWithState(
        fold, out_schema, state_schema, "append", timeout
    )


def assign_sessions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Event-level gap sessionization: every input row plus its
    1-based per-user ``session_id``.

    A new session starts when the gap to the previous event of the
    same user exceeds ``gap_minutes``. Classic lag + cumulative-sum
    over a per-user window: one shuffle on ``user_col``, sort within
    partitions — scales as long as a single user's history fits a
    partition (true for event data keyed by real users; a pathological
    hot user would be salted by session day first).

    ``sessionize`` aggregates this to session grain; composed
    analytics (``flagship_event_analytics``) instead take the
    event-level frame so session stats, activity facts and funnel
    folds all ride this ONE user shuffle — a per-branch re-shuffle of
    the raw log is the difference between 1 and 4 full-log exchanges
    at 100 TB.

    Null timestamps are DROPPED (r10 review): an event with no
    position on the time axis cannot belong to a time-gap session —
    previously nulls sorted first and silently padded session 1's
    event count, diverging from ``sessionize_stream``'s fold, which
    has always skipped them (the join_asof null-ts contract).
    """
    if gap_minutes <= 0:
        # a zero/negative gap "closes" a session on every event —
        # never the sessionization anyone means; fail at construction
        raise ValueError("gap_minutes must be positive")
    events = events.filter(F.col(ts_col).isNotNull())
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_us = gap_minutes * 60 * 1_000_000
    ts_us = F.unix_micros(F.col(ts_col))
    with_flag = events.withColumn(
        "__new_session",
        F.when(ts_us - F.lag(ts_us).over(w) > F.lit(gap_us), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    return with_flag.withColumn(
        "session_id",
        (F.sum("__new_session").over(
            Window.partitionBy(user_col).orderBy(ts_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        ) + F.lit(1)).cast("long"),
    ).drop("__new_session")


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization (batch form): one row per session —
    user, session_id (1-based per user), start/end timestamps and
    event count. ``assign_sessions`` + a session-grain aggregate that
    reuses its user partitioning (no second shuffle)."""
    return (
        assign_sessions(events, user_col, ts_col, gap_minutes)
        .groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def funnel_depth(
    df,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    depth_col: str = "depth",
    window_seconds: int | None = None,
    max_events: int | None = None,
):
    """Ordered-funnel depth per user: how many of ``steps`` the user
    completed in sequence, each step strictly after the previous
    step's event (the ClickHouse ``windowFunnel``-style semantics).
    With ``window_seconds`` every later step must also fall within
    that many seconds of the FIRST matched step (the chain is
    anchored at the first step-1 event — greedy-first-chain, not
    max-over-all-chains; the recursive oracle replays exactly this).

    Greedy first-match fold ≡ the recursive definition
    ``s_k = min ts of step_k with ts > s_{k-1} (and ≤ s_1 + W)`` —
    which is what the SQL oracle replays.

    Scale shape: events are FILTERED to the funnel's types before the
    one hash shuffle on the user, then each user's (ts, type) pairs
    are folded in a single JVM ``aggregate`` over the sorted array —
    no Python, no per-step join chain (k steps would otherwise cost k
    aggregate+join rounds over the full event table). Per-user funnel
    event counts are assumed executor-bounded (the usual case for
    human users); against adversarial/bot keys pass ``max_events`` to
    cap the folded prefix — see ``funnel_fold`` for the exact
    truncation semantics.
    """
    # null timestamps out (r10 review): a null-ts step-1 event sorts
    # FIRST (struct ordering is nulls-first), anchors the greedy chain
    # with t0=null, and every later `ts > null` advance is NULL —
    # depth stuck at 1. The recursive oracle's MIN(ts)/`ts > s_prev`
    # chain already ignores null ts, so this is the parity-true side.
    ev = df.filter(
        F.col(type_col).isin(steps) & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col),
        F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("t")).alias("e"),
    )
    arr = F.array_sort(F.collect_list("e"))
    return (
        ev.groupBy(user_col)
        .agg(arr.alias("__evs"))
        .select(
            user_col,
            funnel_fold(
                F.col("__evs"), steps, window_seconds, max_events
            ).alias(depth_col),
        )
    )


def funnel_fold(
    events_array,
    steps: list[str],
    window_seconds: int | None = None,
    max_events: int | None = None,
):
    """The funnel-depth fold as a reusable Column expression: given a
    SORTED ``array<struct<ts:timestamp, t:string>>``, return the
    greedy-first-chain funnel stage reached (see ``funnel_depth`` for
    the semantics). Pure JVM higher-order ``aggregate`` — usable
    inside any aggregation (e.g. a combined per-user rollup that
    computes session counts, activity facts and funnel depth in ONE
    pass: collect the funnel events with
    ``array_sort(collect_list(when(type.isin(steps), struct(ts, t))))``
    — ``collect_list`` skips the non-funnel nulls — and apply this
    fold), so composed analytics don't pay a separate shuffle per
    funnel.

    Per-key state note: the ``collect_list`` feeding this fold is
    unbounded per key in principle. Human users are self-bounding, but
    a bot-like key (millions of funnel events) could blow a task's
    memory before the fold ever runs. ``max_events`` caps that: the
    sorted array is ``slice``-d to its first ``max_events`` elements
    before folding. Because the fold is greedy-FIRST-chain over a
    time-sorted array, a prefix cap is semantics-preserving whenever
    the chain completes within the first ``max_events`` events; a key
    whose only completing chain starts later reports the prefix's
    depth instead (documented truncation, the standard trade for
    bounded state). The cap bounds the FOLD's input, not the
    collect_list itself — for full ingest-side bounding pre-filter or
    pre-truncate per window upstream."""
    n = len(steps)
    if n == 0:
        raise ValueError("steps must be non-empty")
    if max_events is not None:
        if max_events < 1:
            raise ValueError("max_events must be >= 1")
        events_array = F.slice(events_array, 1, int(max_events))
    lit_steps = F.array(*[F.lit(s) for s in steps])
    init = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("timestamp").alias("t0"),
    )

    def step_fn(acc, e):
        stage = acc.getField("stage")
        in_window = (
            F.lit(True)
            if window_seconds is None
            else (
                F.unix_micros(e.getField("ts"))
                <= F.unix_micros(acc.getField("t0"))
                + F.lit(int(window_seconds) * 1_000_000)
            )
        )
        advance = (
            (stage < F.lit(n))
            & (e.getField("t") == F.element_at(lit_steps, stage + 1))
            & (
                (stage == 0)
                | ((e.getField("ts") > acc.getField("ts")) & in_window)
            )
        )
        return F.when(
            advance,
            F.struct(
                (stage + 1).alias("stage"),
                e.getField("ts").alias("ts"),
                F.when(stage == 0, e.getField("ts"))
                .otherwise(acc.getField("t0"))
                .alias("t0"),
            ),
        ).otherwise(acc)

    return F.aggregate(events_array, init, step_fn).getField("stage")


# ---------------------------------------------------------------------------
# Versioned state commit — shared by the stateful drains below.
#
# A bare ``mode("overwrite").parquet(state_dir)`` is delete-then-write:
# a crash mid-overwrite loses (or tears) ALL prior state, and the
# resumed batch sees a missing path. The drains instead commit state in
# two phases: (1) write the merged state to an immutable per-version
# directory ``{state_dir}/v{batch_id}``, then (2) flip a one-line
# pointer file via a single-file rename — atomic on POSIX — so readers
# only ever observe the last fully-written version. A crash between the
# phases leaves the old pointer (old state) committed; the replayed
# batch simply overwrites the orphaned version directory and re-flips.
#
# Pointer ops go through the Hadoop FileSystem via the JVM gateway
# (idr_data_pipelines_spark.fsio — the r11 Catalog pattern), so
# ``state_dir`` may be any URI Spark itself can write (hdfs://,
# file://, a local path). The pointer flip is
# FileContext.rename(OVERWRITE) — atomic on HDFS and local
# filesystems, the direct analogue of ``os.replace``; object stores
# without atomic rename (S3) keep the documented caveat: put state on
# a real filesystem. Under Spark Connect (no gateway) fsio falls back
# to the local API, correct for the driver-visible paths Connect
# clients pass.
# ---------------------------------------------------------------------------

_STATE_POINTER = "CURRENT"


def _state_version(spark: SparkSession, state_dir: str) -> int | None:
    """The committed version number (the pointer's ``v{N}``), or None
    before any commit. The replay fence for ALL the drains: a replayed
    batch has ``batch_id <= _state_version`` and must be skipped —
    besides re-applying non-idempotent merges, re-committing version
    ``v{batch_id}`` would overwrite the very directory the merge plan
    lazily reads (Spark refuses: 'Cannot overwrite a path that is also
    being read from'), wedging the stream on every restart."""
    import posixpath

    from idr_data_pipelines_spark import fsio

    text = fsio.read_text(
        spark, posixpath.join(state_dir, _STATE_POINTER)
    )
    if text is None:
        return None
    return int(text.strip().lstrip("v"))


def _state_read(
    spark: SparkSession, state_dir: str, schema: StructType
) -> DataFrame | None:
    """Read the last committed state version; None before any commit."""
    import posixpath

    version = _state_version(spark, state_dir)
    if version is None:
        return None
    return spark.read.schema(schema).parquet(
        posixpath.join(state_dir, f"v{version}")
    )


def _state_commit(df: DataFrame, state_dir: str) -> None:
    """Write ``df`` as the NEXT state version and atomically flip the
    pointer to it; garbage-collect superseded version directories.

    ``state_dir`` resolves through the Hadoop FileSystem (fsio), so
    any URI Spark can write works — the version parquet, the pointer
    flip and the GC listing all see the SAME filesystem (r12: the
    pointer ops were previously driver-local ``os`` calls, so a DFS
    state_dir silently read as "no pointer" every run and grew a
    stray local directory).

    The version number is always ``current + 1`` — never a caller-
    supplied batch id — so a replayed batch that merged the lazily-read
    current version writes a brand-new directory instead of
    overwriting the one its plan reads (Spark refuses that overwrite,
    which would wedge the stream on every restart). Replays are then
    naturally safe for idempotent merges (latest-per-key, register-
    max): re-merging already-applied rows reproduces the same state
    one version later. Non-idempotent merges (the top-k SUM) carry
    their own batch-id fence IN the state data, which is independent
    of directory naming."""
    import posixpath

    from idr_data_pipelines_spark import fsio

    spark = df.sparkSession
    current = _state_version(spark, state_dir)
    version_name = f"v{0 if current is None else current + 1}"
    df.write.mode("overwrite").parquet(
        posixpath.join(state_dir, version_name)
    )
    fsio.write_text_atomic(
        spark, posixpath.join(state_dir, _STATE_POINTER), version_name
    )
    # Best-effort GC: a crash here orphans old version dirs, never state.
    for name in fsio.list_names(spark, state_dir):
        if name.startswith("v") and name != version_name:
            try:
                fsio.delete(spark, posixpath.join(state_dir, name))
            except Exception:
                pass  # orphaned dir, retried by the next commit's GC


def cdc_upsert_drain(
    spark: SparkSession,
    path: str,
    schema: StructType,
    checkpoint_dir: str,
    dim_dir: str,
    key_cols: list[str],
    order_cols: list[str],
    max_files_per_trigger: int | None = None,
    ascending: bool = False,
) -> "DataFrame":
    """Streaming CDC → dimension maintenance: drain all available
    update files and maintain a latest-per-key dimension at
    ``dim_dir``; returns the final dimension.

    Each micro-batch merges via **latest-per-key over (existing dim ∪
    batch)**, ordering by ``order_cols`` (descending) with the row's
    REMAINING orderable columns as a deterministic residual tie-break
    (r10 review: rows tying on every order col otherwise picked a
    partition-layout-dependent winner, so one-batch vs trickled
    drains could converge to DIFFERENT dimensions — the
    batching-independence the operator exists for; with the residual
    order the winner is a pure function of the row multiset PROVIDED
    rows that tie on every orderable column are identical. Rows
    differing ONLY in a non-orderable column (map, binary inside a
    struct Spark won't sort) still pick a layout-dependent winner —
    the residual tie-break cannot see those columns. If a source can
    emit such rows, pre-serialize the non-orderable columns to an
    orderable form (e.g. ``F.to_json``) in an extra column and put it
    in ``order_cols``; this operator doesn't do that implicitly
    because a silent to_json of a multi-MB payload column in the sort
    key is a worse default than the documented caveat) —
    an associative, commutative merge, so the final dimension is
    identical whatever the batching: one availableNow batch,
    file-by-file trickle, or crash-and-resume from the checkpoint
    ledger all converge to the same table (which is what makes the
    operator exactly oracle-able as a single batch window query). A
    blind "replace matching keys" upsert would NOT have this property
    — a late-arriving old update would clobber newer state.

    The dim is rewritten per batch through the versioned two-phase
    state commit (``_state_commit``): merge reads the old version, the
    new version lands in its own directory, and a pointer flip
    publishes it — a crash at any point leaves the previous committed
    dim intact. No batch-id fence is needed here because the
    latest-per-key merge is idempotent (replaying a batch re-derives
    the same winners). Correct for dimension-sized state (the usual
    CDC target); a fact-sized target wants a storage layer with
    row-level merge instead.
    """
    from pyspark.sql import Window

    if "__rn" in schema.fieldNames():
        # r12 API-boundary sweep (the joins._reserve precedent): the
        # latest-per-key merge uses __rn as its working column — a dim
        # schema carrying it would be silently overwritten and dropped
        raise ValueError(
            "cdc_upsert_drain reserves the column name '__rn'; rename "
            "it in the update schema"
        )

    def _latest(df: DataFrame) -> DataFrame:
        from idr_data_pipelines_spark.operators.joins import _orderable

        order = (
            [F.col(c).asc() for c in order_cols]
            if ascending
            else [F.col(c).desc() for c in order_cols]
        )
        # residual content tie-break — see the docstring's
        # batching-independence note
        named = set(key_cols) | set(order_cols)
        residual = [
            F.col(f.name).asc()
            for f in df.schema.fields
            if f.name not in named and _orderable(f.dataType)
        ]
        w = Window.partitionBy(*key_cols).orderBy(*order, *residual)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    cols = [f.name for f in schema.fields]

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        merged = _latest(batch_df.select(*cols))
        existing = _state_read(s, dim_dir, schema)
        if existing is not None:
            # old version dir is immutable — the merge can read it
            # lazily while the new version writes elsewhere (no
            # localCheckpoint pin needed, unlike a self-overwrite);
            # a replayed batch re-merges idempotently into a NEW
            # version (see _state_commit)
            merged = _latest(existing.unionByName(merged))
        _state_commit(merged, dim_dir)

    _drain_foreach_batch(
        spark, path, schema, checkpoint_dir, _apply,
        max_files_per_trigger=max_files_per_trigger,
    )
    out = _state_read(spark, dim_dir, schema)
    if out is None:  # zero-message inbox: empty dimension
        return spark.createDataFrame([], schema)
    return out


def _topk_state_schema(schema: StructType, key_cols: list[str]) -> StructType:
    from pyspark.sql.types import LongType, StructField

    return StructType(
        [StructField(c, schema[c].dataType) for c in key_cols]
        + [StructField("cnt", LongType()), StructField("last_batch_id", LongType())]
    )


def _topk_merge_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    state_schema: StructType,
    key_cols: list[str],
) -> None:
    """Merge one micro-batch's partial counts into the ``state_dir``
    table, fenced by batch id so a replayed batch is a no-op.

    The key-wise SUM merge is associative+commutative but NOT
    idempotent, so at-least-once delivery (a crash between the state
    commit and the checkpoint commit replays the batch on resume)
    would double-count without fencing. The state carries the
    last-applied ``batch_id`` inside the same versioned state commit
    (``_state_commit``: immutable version dir + pointer flip), so the
    guard is always consistent with whatever state a reader can
    observe: replayed ``batch_id <= last_batch_id`` is skipped, and a
    crash mid-commit leaves the previous version committed rather than
    losing state. Batch ids are stable under checkpointed resume,
    which is exactly the replay case the fence exists for (a deleted
    checkpoint restarts ids at 0 — pair state_dir and checkpoint_dir
    lifetimes).
    """
    s = batch_df.sparkSession
    partial = batch_df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    existing = _state_read(s, state_dir, state_schema)
    if existing is not None:
        # the fence is written as ONE literal per commit, so any row
        # carries it — read one row instead of a full-state MAX scan
        # (r10 review: the max() launched an extra whole-state job per
        # micro-batch, doubling state I/O on the hot drain path)
        row = existing.select("last_batch_id").limit(1).first()
        applied = row[0] if row is not None else None
        if applied is not None and applied >= batch_id:
            return  # replayed batch: merge already committed
        partial = (
            existing.drop("last_batch_id")
            .unionByName(partial)
            .groupBy(*key_cols)
            .agg(F.sum("cnt").alias("cnt"))
        )
    _state_commit(
        partial.withColumn("last_batch_id", F.lit(batch_id).cast("long")),
        state_dir,
    )


def topk_stream_drain(
    spark: SparkSession,
    path: str,
    schema: StructType,
    checkpoint_dir: str,
    state_dir: str,
    key_cols: list[str],
    k: int = 20,
    max_files_per_trigger: int | None = None,
) -> "DataFrame":
    """Streaming heavy hitters: drain all available event files and
    maintain a running per-key count table at ``state_dir``; return the
    final EXACT top-k by (count desc, keys asc).

    Each micro-batch contributes a partial ``groupBy(keys).count()``
    that is merged into the state by key-wise SUM. Addition is
    associative and commutative, so the final counts are
    batching-independent; it is NOT idempotent, so crash-and-resume
    safety comes from batch-id fencing in ``_topk_merge_batch``: the
    last-applied batch id is committed atomically with the state, and
    a replayed batch is skipped. Together the operator converges to
    the plain batch GROUP BY + ORDER BY LIMIT answer under any
    batching or crash schedule, which makes it exactly oracle-able.

    100 TB design: the per-batch partial agg collapses each batch to
    ≤ |distinct keys in batch| rows before touching state, and the
    state table is key-cardinality-sized, not stream-sized — EXACT
    counts are therefore unbounded state when the key space is
    unbounded (e.g. free-text keys at corpus scale). For those, use
    the bounded-state Misra-Gries alternative ``sketch_topk_mg``
    (``llmdata/sketches.py``, error ≤ N/m with m counters) or pair the
    count-min sketch with a candidate heap; this operator is the exact
    path for executor-bounded key spaces (users, pages, status codes),
    which is the common monitoring case.
    """
    state_schema = _topk_state_schema(schema, key_cols)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        _topk_merge_batch(batch_df, batch_id, state_dir, state_schema, key_cols)

    _drain_foreach_batch(
        spark, path, schema, checkpoint_dir, _apply,
        max_files_per_trigger=max_files_per_trigger,
    )
    counts = _state_read(spark, state_dir, state_schema)
    if counts is None:  # zero-message inbox
        counts = spark.createDataFrame([], state_schema)
    return counts.drop("last_batch_id").orderBy(
        F.desc("cnt"), *[F.asc(c) for c in key_cols]
    ).limit(k)


def distinct_stream_drain(
    spark: SparkSession,
    path: str,
    schema: StructType,
    checkpoint_dir: str,
    state_dir: str,
    key_col: str,
    group_col: str,
    max_files_per_trigger: int | None = None,
) -> "DataFrame":
    """Streaming approximate distinct-count: drain all available event
    files, maintaining one DataSketches HLL sketch per ``group_col``
    value at ``state_dir``; return (group, approx_distinct).

    Each micro-batch builds per-group sketches (``hll_sketch_agg``)
    and merges them into state with ``hll_union_agg`` — register-max
    is associative, commutative AND idempotent, so the final sketch is
    byte-identical to the one-shot batch sketch whatever the batching
    (tests assert streamed estimate == batch estimate exactly).
    Idempotence matters specifically for streams: a replayed batch
    (crash between state write and checkpoint commit) cannot inflate
    the count — no fencing needed, unlike the non-idempotent SUM merge
    in ``topk_stream_drain``, which carries a batch-id fence instead.

    100 TB design: state is |groups| sketches of fixed size (~KB at
    lgK=12) — independent of both stream length and key cardinality;
    per-batch work collapses map-side to |batch groups| rows before
    touching state.
    """
    from pyspark.sql.types import BinaryType, StructField

    state_schema = StructType(
        [
            StructField(group_col, schema[group_col].dataType),
            StructField("sk", BinaryType()),
        ]
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        partial = batch_df.groupBy(group_col).agg(
            F.hll_sketch_agg(key_col).alias("sk")
        )
        existing = _state_read(s, state_dir, state_schema)
        if existing is not None:
            # register-max is idempotent: a replayed batch re-merges
            # into a NEW version (see _state_commit), same registers
            partial = (
                existing.unionByName(partial)
                .groupBy(group_col)
                .agg(F.hll_union_agg("sk").alias("sk"))
            )
        _state_commit(partial, state_dir)

    _drain_foreach_batch(
        spark, path, schema, checkpoint_dir, _apply,
        max_files_per_trigger=max_files_per_trigger,
    )
    state = _state_read(spark, state_dir, state_schema)
    if state is None:  # zero-message inbox
        state = spark.createDataFrame([], state_schema)
    return state.select(
        group_col, F.hll_sketch_estimate("sk").alias("approx_distinct")
    )


def distinct_stream_drain_md5(
    spark: SparkSession,
    path: str,
    schema: StructType,
    checkpoint_dir: str,
    state_dir: str,
    key_col: str,
    group_col: str,
    b: int = 6,
    max_files_per_trigger: int | None = None,
) -> "DataFrame":
    """``distinct_stream_drain`` with the ENGINE-PORTABLE md5-32 HLL —
    state is the REGISTER TABLE itself, (group, bucket, register)
    integer rows (see ``llmdata.sketches.hll_md5_registers``), merged
    with ``MAX`` per (group, bucket). Register-max is associative,
    commutative and idempotent exactly like the DataSketches union, so
    the drained state equals the one-shot batch register table
    whatever the batching OR replays — and because every register is
    exact integer arithmetic over md5 bytes, that final state has a
    full SQL oracle (the DataSketches form's bytes don't). Returns the
    register table; derive estimates with
    ``hll_estimate_from_registers``.

    Same 100 TB shape: state is ≤ |groups|·2^b integer rows —
    independent of stream length and key cardinality; each batch
    collapses map-side to its own (group, bucket) rows before touching
    state.

    The bucket width ``b`` is part of the state's GEOMETRY: it is
    recorded in a ``_HLL_B`` sidecar on first use and re-draining the
    same ``state_dir`` with a different ``b`` refuses (r10 review:
    registers from two bucket splits would otherwise max-merge into
    one table and estimate garbage, silently). The sidecar resolves
    through the same Hadoop-FileSystem convention as the
    ``_state_commit`` pointer (fsio), so a DFS ``state_dir`` engages
    the geometry guard too.
    """
    import posixpath

    from pyspark.sql.types import LongType, StringType, StructField

    from idr_data_pipelines_spark import fsio
    from idr_data_pipelines_spark.llmdata.sketches import hll_md5_registers

    meta = posixpath.join(state_dir, "_HLL_B")
    stored_text = fsio.read_text(spark, meta)
    if stored_text is not None:
        stored = int(stored_text.strip())
        if stored != b:
            raise ValueError(
                f"state_dir {state_dir!r} was built with b={stored}; "
                f"re-draining with b={b} would merge registers from "
                "incompatible bucket geometries — pass the original b "
                "or a fresh state_dir"
            )
    else:
        fsio.mkdirs(spark, state_dir)
        fsio.write_text_atomic(spark, meta, str(b))

    state_schema = StructType(
        [
            StructField("grp", StringType()),
            StructField("bucket", LongType()),
            StructField("register", LongType()),
        ]
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        partial = hll_md5_registers(
            batch_df, key_col, group_col, b=b, with_union=False
        )
        existing = _state_read(s, state_dir, state_schema)
        if existing is not None:
            partial = (
                existing.unionByName(partial)
                .groupBy("grp", "bucket")
                .agg(F.max("register").alias("register"))
            )
        _state_commit(partial, state_dir)

    _drain_foreach_batch(
        spark, path, schema, checkpoint_dir, _apply,
        max_files_per_trigger=max_files_per_trigger,
    )
    state = _state_read(spark, state_dir, state_schema)
    if state is None:  # zero-message inbox
        state = spark.createDataFrame([], state_schema)
    return state


def dedup_stream_index_drain(
    spark: SparkSession,
    path: str,
    schema: StructType,
    checkpoint_dir: str,
    state_dir: str,
    fp_col: str = "fp",
    id_col: str = "doc_id",
    max_files_per_trigger: int | None = None,
) -> "DataFrame":
    """Streaming exact dedup against a PERSISTENT survivor index —
    the streaming twin of ``llmdata.dedup.dedup_incremental``: each
    micro-batch of (pre-fingerprinted) documents merges
    first-wins-per-fingerprint over (index ∪ batch), and the surviving
    rows ARE the index (versioned two-phase state commits, replay
    idempotent). ``min(id)`` is associative and commutative, so the
    final survivor set equals the one-shot batch
    ``row_number() OVER (PARTITION BY fp ORDER BY id) = 1`` answer
    regardless of how ingestion was batched — which is exactly what
    the oracle checks. At production scale the state generalizes to a
    bucketed-by-``fp`` table (sinks.sink_table_bucketed) so each batch
    merge shuffles only the batch."""
    return cdc_upsert_drain(
        spark,
        path,
        schema,
        checkpoint_dir,
        state_dir,
        key_cols=[fp_col],
        order_cols=[id_col],
        max_files_per_trigger=max_files_per_trigger,
        ascending=True,
    )


def event_transitions(
    events: "DataFrame",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> "DataFrame":
    """First-order Markov transition matrix over event types: for each
    (from_type, to_type) pair, the count of consecutive occurrences
    within a user's timeline and the row-normalized transition
    probability — the behavioral-model / anomaly-baseline primitive.
    Ordering ties on ``ts_col`` break on ``id_col`` so the sequence —
    and therefore the counts — are deterministic.

    Scale shape: one user-key shuffle for the ``lead`` window, one
    counting aggregate whose output is bounded at |event types|² rows
    regardless of corpus size; the probability is an exact int/int
    division over a window on that tiny frame."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.withColumn("__to", F.lead(type_col).over(w))
        .filter(F.col("__to").isNotNull())
        .select(
            F.col(type_col).alias("from_type"), F.col("__to").alias("to_type")
        )
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    row = Window.partitionBy("from_type")
    return counts.withColumn(
        "prob", F.col("n").cast("double") / F.sum("n").over(row).cast("double")
    )


def markov_removal_attribution(
    events: "DataFrame",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    conversion: str = "purchase",
    n_iter: int = 32,
) -> "DataFrame":
    """Markov removal-effect attribution (Anderl et al. 2016, the
    data-driven alternative to last-touch/position rules): model each
    user's touch journey START → touches → CONV/NULL as a first-order
    Markov chain, compute the chain's conversion-absorption
    probability, then for every channel recompute it with that
    channel REMOVED (its incoming transitions redirect to
    non-conversion, outgoing mass unreferenced — the published
    non-renormalizing removal). A channel's credit is how much total
    conversion probability disappears without it.

    Returns one row per channel:
    (channel, n_touches, removal_effect_r, attribution_share_r) —
    removal_effect = (p_base − p_removed)/p_base, share = each
    channel's absolute drop over the sum of drops.

    Determinism / replayability: the distributed part is ONE user-key
    window (journey positions) + ONE bounded |states|² counting
    aggregate, exactly the `event_transitions` shape. Everything
    after runs on the collected transition-count matrix — a
    model-sized driver transfer, same class as centroid seeds — in
    PURE INTEGER e6 fixed-point: transition probs are
    (n·1e6 + tot//2)//tot, each absorption iteration re-rounds to e6
    via (Σ + 5e5)//1e6, and both removal drops and their sum stay
    integers, so a SQL oracle replays every value bit-for-bit with
    unrolled iteration CTEs (integer sums are order-free, unlike the
    float folds this avoids). Fixed horizon ``n_iter`` = truncated
    absorption — journeys longer than it contribute their residual
    mass to neither outcome, identically in both engines. Removal can
    only zero non-negative contributions and the per-iteration
    rounding is monotone, so drops are provably ≥ 0.

    Reserved names: the sentinels ``START``/``CONV``/``NULL`` (and the
    oracle's ``__none__`` base-scenario tag) cannot also be real
    ``type_col`` values — a literal 'NULL' event type would silently
    absorb as non-conversion, 'CONV' would invent conversion credit.
    The collected transition matrix is checked and a collision raises.
    """
    from pyspark.sql.types import LongType, StringType, StructField

    START, CONV, NULL = "START", "CONV", "NULL"
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    seq = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("state"),
        F.row_number().over(w).alias("pos"),
    )
    conv = (
        seq.filter(F.col("state") == conversion)
        .groupBy("u")
        .agg(F.min("pos").alias("cpos"))
    )
    users = seq.select("u").distinct()
    touches = (
        seq.join(conv, "u", "left")
        .filter(F.col("cpos").isNull() | (F.col("pos") < F.col("cpos")))
        .select("u", "pos", "state")
    )
    terminals = users.join(conv, "u", "left").select(
        "u",
        F.lit(2**62).alias("pos"),
        F.when(F.col("cpos").isNotNull(), F.lit(CONV))
        .otherwise(F.lit(NULL))
        .alias("state"),
    )
    starts = users.select("u", F.lit(0).alias("pos"), F.lit(START).alias("state"))
    states = touches.unionByName(starts).unionByName(terminals)
    w2 = Window.partitionBy("u").orderBy("pos")
    counts = (
        states.withColumn("t", F.lead("state").over(w2))
        .filter(F.col("t").isNotNull())
        .groupBy(F.col("state").alias("f"), "t")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()  # bounded at (|event types| + 1)² rows
    )

    # sentinel-collision guard: a real event type named like a
    # sentinel appears where the sentinel never does — as an
    # f (CONV/NULL are terminal-only) or as a non-terminal t (START
    # is source-only) — so the collected matrix exposes it exactly
    real_states = {r.f for r in counts if r.f != START} | {
        r.t for r in counts if r.t not in (CONV, NULL)
    }
    clash = real_states & {START, CONV, NULL, "__none__"}
    if clash:
        raise ValueError(
            f"event types collide with reserved attribution states: "
            f"{sorted(clash)} — rename them upstream"
        )

    out_tot: dict[str, int] = {}
    for r in counts:
        out_tot[r.f] = out_tot.get(r.f, 0) + r.n
    p_e6: dict[str, list[tuple[str, int]]] = {}
    for r in counts:
        tot = out_tot[r.f]
        p_e6.setdefault(r.f, []).append(
            (r.t, (r.n * 1_000_000 + tot // 2) // tot)
        )
    channels = sorted(f for f in out_tot if f != START)

    def absorb(removed: str | None) -> int:
        p = {s: 0 for s in [START, *channels]}
        for _ in range(n_iter):
            nxt = {}
            for s in p:
                acc = 0
                for t, pe6 in p_e6.get(s, ()):
                    if t == CONV:
                        v = 1_000_000
                    elif t == NULL or t == removed:
                        v = 0
                    else:
                        v = p.get(t, 0)
                    acc += pe6 * v
                nxt[s] = (acc + 500_000) // 1_000_000
            p = nxt
        return p[START]

    base = absorb(None)
    drops = {c: base - absorb(c) for c in channels}
    tot_drop = sum(drops.values())
    schema = StructType(
        [
            StructField("channel", StringType()),
            StructField("n_touches", LongType()),
            StructField("drop_e6", LongType()),
        ]
    )
    ints = events.sparkSession.createDataFrame(
        [(c, out_tot[c], drops[c]) for c in channels], schema
    )
    # final ratios as JVM expressions, NOT Python round(): F.round is
    # HALF_UP like the SQL oracles' ROUND, Python's round is half-even
    return ints.select(
        "channel",
        "n_touches",
        F.when(
            F.lit(base) > 0,
            F.round(F.col("drop_e6").cast("double") / F.lit(float(base)), 6),
        ).alias("removal_effect_r"),
        F.when(
            F.lit(tot_drop) > 0,
            F.round(
                F.col("drop_e6").cast("double") / F.lit(float(tot_drop)), 6
            ),
        ).alias("attribution_share_r"),
    )
