"""Structured-Streaming ingest: the engine's incremental path.

The reference has no real streaming — its incremental story is
request-driven point re-sync (SURVEY.md §2.9, I1–I4:
/root/reference/src/routes/ticket_routes.py:212-264). Re-expressed
Spark-first, the same contract becomes:

  * a file/Kafka ``readStream`` source replaces the POST endpoints
    (S5/S6) — new files in a drop directory are the ingest batches;
  * ``withWatermark`` + tumbling/session windows give late-data-safe
    aggregation the reference never had;
  * ``foreachBatch`` + :func:`..sinks.upsert.merge_latest_wins` gives
    the point-upsert semantics (I1) transactionally per micro-batch;
  * ``trigger(availableNow=True)`` turns the same pipeline into a
    catch-up batch job — one code path for both modes.

Scale notes: windowed state lives in the state store keyed by
(window, group); the watermark bounds state size. Session windows use
the built-in ``session_window`` (state-store-merged in streaming, hash
aggregation in batch) rather than a hand-rolled applyInPandasWithState
— the built-in is codegen'd and spill-aware.

API note: Spark 4's ``transformWithStateInPandas`` (the successor
stateful API) was probed and is unusable in this environment — its
driver worker requires ``google.protobuf``, which is not installed.
The custom stateful operator therefore targets
``applyInPandasWithState`` with event-time timers, which runs and
drains correctly (execution-tested below and in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.functions.scalar import finite_or_null
from sql_database_to_elastic_datalake_spark.sinks.upsert import merge_latest_wins
from sql_database_to_elastic_datalake_spark.sources.parquet import (
    _nanos_timestamp_cols,
)


def read_stream_parquet(
    spark: SparkSession, directory: str, glob: str = "*.parquet"
) -> DataFrame:
    """File-source stream over a parquet drop directory.

    Streams need an explicit schema; we take it from a batch read of the
    currently-present files (footer-only). Nanos timestamps get the same
    long→micros conversion as the batch loader. ``glob`` narrows the
    stream to one table's files when several share the directory; when
    it names a DIRECTORY table (``events.parquet/`` holding part files
    — the multi-file layout any real lake has), the stream reads that
    directory's files instead (pathGlobFilter matches file names only).
    """
    import os as _os

    if "*" not in glob and "?" not in glob \
            and _os.path.isdir(_os.path.join(directory, glob)):
        directory = _os.path.join(directory, glob)
        glob = "*.parquet"
    nanos = _nanos_timestamp_cols(_first_match(directory, glob))
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.option("pathGlobFilter", glob).parquet(directory)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", glob)
        .parquet(directory)
    )
    for c in nanos:
        stream = stream.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return stream


def _first_match(directory: str, glob: str) -> str:
    import fnmatch
    import os

    for f in sorted(os.listdir(directory)):
        if fnmatch.fnmatch(f, glob):
            return os.path.join(directory, f)
    return directory


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool = True,
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window counts + exact decimal sums per key.

    In streaming mode the watermark bounds state and admits late data up
    to its horizon; the identical expression runs in batch mode for
    backfills (``streaming=False`` skips the watermark, which batch
    ignores anyway).
    """
    src = events.withWatermark(ts_col, watermark) if streaming else events
    return (
        src.groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col(key_col),
        )
        .agg(
            F.count("*").alias("n_events"),
            # finite-values policy (functions/scalar.py:finite_or_null):
            # one NaN/Inf row must not poison (or, under ANSI decimal
            # casts, kill) an unbounded streaming aggregation
            F.sum(finite_or_null(value_col).cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    streaming: bool = False,
) -> DataFrame:
    """Per-key session aggregation with the built-in session_window
    (gap-based). Works identically in batch and streaming."""
    src = events.withWatermark(ts_col, watermark) if streaming else events
    return (
        src.groupBy(
            F.session_window(F.col(ts_col), gap).alias("s"),
            F.col(key_col),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.col("s.start").alias("session_start"),
            "n_events",
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming plan with availableNow (process everything
    currently available, then stop) into an in-memory sink and return
    the materialized result as a batch DataFrame.

    No-data micro-batches are disabled for the run: they exist to
    finalize watermark-closed windows of *append-mode windowed
    aggregations* during quiet periods; every consumer of this helper is
    complete-mode (full state re-emitted each batch) or immediate-emit
    append (dropDuplicates, inner interval join), where the trailing
    empty batch only pays state-store commit cost (~0.5-0.7 s per query)
    without changing one output row. Continuous production streams keep
    the engine default.

    Stateful operators shard their state by ``spark.sql.shuffle.partitions``
    at checkpoint creation, with no AQE coalescing — on a default 200-
    partition session every micro-batch pays 200 state-store tasks for
    demo-sized state. This helper caps the run at 8 (never raising a
    lower user setting); continuous deployments size state partitions to
    key cardinality instead. Measured at sf0.1 / local[32] (100k rows,
    3.6k state rows, warm session): addBatch is ~1.0-1.4 s at 32 state
    partitions, ~0.45 s at 8, ~0.36 s at 4 — per-task state-store
    open/commit dominates, so fewer-but-fatter state tasks win until a
    partition's state stops fitting in memory (≫ demo scale). The
    remaining streaming-vs-batch delta (~0.4 s: offset WAL, query
    planning, commit log) is the micro-batch machinery floor.
    """
    spark = stream_df.sparkSession
    nodata_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    shuffle_key = "spark.sql.shuffle.partitions"
    prior_nodata = spark.conf.get(nodata_key)
    prior_shuffle = spark.conf.get(shuffle_key)
    spark.conf.set(nodata_key, "false")
    spark.conf.set(shuffle_key, str(min(int(prior_shuffle), 8)))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(nodata_key, prior_nodata)
        spark.conf.set(shuffle_key, prior_shuffle)
    return spark.table(name)


def stream_upsert_into(
    updates_stream: DataFrame,
    target_path: str,
    keys: list[str],
    version_col: str,
    checkpoint: str,
    partition_col: str | None = None,
) -> "object":
    """foreachBatch MERGE: each micro-batch is merged latest-wins into
    the parquet target — the streaming form of the reference's point
    upsert (I1). Returns the StreamingQuery.

    Without ``partition_col``, each batch is read-merge-overwrite over
    the WHOLE target — the plain-parquet stand-in for a transactional
    MERGE INTO (at 100 TB the target would be Delta/Iceberg and this
    body becomes one MERGE statement), O(table) per batch.

    With ``partition_col`` (the scale fast path, r5): the target is a
    partitioned layout and each batch touches ONLY the partitions its
    rows land in — read base pruned to the batch's partition values,
    merge, and dynamic-partition-overwrite exactly those partitions.
    Per-batch cost becomes O(touched partitions), the same placement a
    Delta MERGE achieves via file skipping. CONTRACT: a key's
    ``partition_col`` value must be stable across versions (derive it
    from the key or an immutable attribute) — a key that moved
    partitions would leave its stale row behind in the old partition,
    exactly like any partition-pruned MERGE.
    """
    spark = updates_stream.sparkSession

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from sql_database_to_elastic_datalake_spark.fs import path_exists

        # Only a genuinely-absent target means "first batch". Catching
        # every exception here turned a transient read failure (storage
        # hiccup, throttle) into base=None -> mode("overwrite") replacing
        # the WHOLE merged history with one micro-batch. Existence is
        # checked explicitly via the Hadoop FileSystem resolved from the
        # path (os.path.exists answers False for hdfs://s3a:// URIs,
        # which would re-overwrite the table on every batch); read
        # errors on an existing target re-raise and the batch retries
        # instead of destroying the table.
        if path_exists(spark, target_path):
            base = spark.read.parquet(target_path)
            if partition_col is not None:
                # one tiny driver list (one value per touched
                # partition); the IN filter prunes the base scan to
                # exactly those partition directories. NULL partition
                # values need isNull explicitly — isin([None]) never
                # matches, which would EXCLUDE the base's null
                # partition from the merge while the dynamic overwrite
                # still replaced it (silent data loss).
                touched = [
                    r[0] for r in
                    batch_df.select(partition_col).distinct().collect()
                ]
                pred = F.col(partition_col).isin(
                    [t for t in touched if t is not None]
                )
                if any(t is None for t in touched):
                    pred = pred | F.col(partition_col).isNull()
                base = base.filter(pred)
        else:
            base = None
        if base is None:
            merged = merge_latest_wins(
                batch_df, batch_df.limit(0), keys, version_col
            )
        else:
            merged = merge_latest_wins(base, batch_df, keys, version_col)
        merged.cache()
        merged.count()
        writer = merged.write.mode("overwrite")
        if partition_col is not None:
            # writer-level dynamic mode: only partitions present in
            # `merged` are replaced; untouched ones keep their files
            writer = (
                writer.partitionBy(partition_col)
                .option("partitionOverwriteMode", "dynamic")
            )
        writer.parquet(target_path)
        merged.unpersist()

    return (
        updates_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def running_user_totals_stateful(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    timeout_minutes: int = 60,
    watermark_delay: str = "10 minutes",
    cent_scale: int | None = None,
) -> DataFrame:
    """Custom stateful streaming operator: per-user running totals via
    ``applyInPandasWithState``.

    ``cent_scale`` (e.g. 100 for 2-decimal money) switches accumulation
    to exact integer units: pandas float sums use pairwise summation,
    whose rounding depends on block boundaries, so plain double totals
    are not reproducible against a sequential-sum oracle — integer
    accumulation is order-free and makes the operator hash-checkable.

    Built-ins cover windows/sessions; this is the escape hatch for
    semantics they can't express (cross-batch accumulators with custom
    eviction). State is one (count, total) pair per user, evicted after
    ``timeout_minutes`` of *event-time* silence — state size stays
    O(active users), the property that keeps it viable at 100 TB/day.

    Emits one row per user per micro-batch: (user_id, n_events, total).

    Eviction MUST be ``EventTimeTimeout`` (watermark-driven), not
    ``ProcessingTimeTimeout``: a pending processing-time timer keeps the
    micro-batch engine scheduling ~1 batch/sec until it fires (observed:
    1600+ empty commits), so an ``availableNow`` run never drains. The
    watermark only advances with data, so event-time timers quiesce with
    the source. The timed-out branch evicts and returns without
    re-arming for the same reason.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # applyInPandasWithState hands ts to pandas as tz-NAIVE values in
    # the SESSION timezone, while setTimeoutTimestamp speaks UTC epoch
    # millis — a bare .timestamp() on the naive value re-interprets
    # session-local wall time as UTC and skews every eviction timer by
    # the tz offset. Localize with the session tz before converting.
    session_tz = events.sparkSession.conf.get("spark.sql.session.timeZone")
    out_schema = "user_id bigint, n_events bigint, total double"
    # m = count of FINITE values accumulated: SUM-over-no-rows is NULL
    # in SQL, so a user whose every value is NaN/Inf must emit a NULL
    # total (not 0.0) to match the paired oracle
    state_schema = "n bigint, total double, m bigint"
    timeout_ms = timeout_minutes * 60 * 1000

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # idle horizon passed: evict, emit nothing, do not re-arm
            state.remove()
            return
        # with cent_scale, the state accumulator holds exact integer
        # units (a double is exact up to 2^53); division to the public
        # unit happens once at emit — one rounding, batch-order free.
        n, total, m = state.get if state.exists else (0, 0.0, 0)
        max_ts_ms = None
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                # finite-values policy: NaN/Inf drop out of the total
                # like NULLs (int(inf) would kill the task); n_events
                # still counts every row
                vals = pdf[value_col][np.isfinite(pdf[value_col])]
                m += int(len(vals))
                if cent_scale:
                    # sign-aware half-away-from-zero, never .round():
                    # pandas rounds half-to-even while SQL round() is
                    # half-away — exact .5-unit products diverge
                    # (cookbook rule 3). Plain floor(x+0.5) would be
                    # half-UP, which diverges from SQL round on
                    # negative halves (refunds: -2.5 must give -3, not
                    # -2); the oracle mirrors this CASE exactly.
                    v = vals.mul(float(cent_scale))
                    cents = np.where(
                        v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)
                    )
                    total += float(int(cents.sum()))
                else:
                    total += float(vals.sum())
            if len(pdf):
                t = pd.Timestamp(pdf[ts_col].max())
                if t.tzinfo is None:
                    t = t.tz_localize(session_tz)
                batch_max = t.timestamp() * 1000
                if max_ts_ms is None or batch_max > max_ts_ms:
                    max_ts_ms = batch_max
        state.update((n, total, m))
        # arm off the key's own newest event, NOT the watermark: during
        # the first batch the watermark is still unset (0), and a timer
        # anchored there lands in 1970 — a restarted run's checkpointed
        # watermark is past it and evicts all state before processing.
        # Spark requires the timer strictly ahead of the current
        # watermark; flooring the base at the watermark guarantees that.
        wm = state.getCurrentWatermarkMs()
        base = wm if max_ts_ms is None else max(max_ts_ms, wm)
        state.setTimeoutTimestamp(int(base + timeout_ms))
        if m == 0:
            emitted = None  # SQL SUM over zero finite rows
        else:
            emitted = total / cent_scale if cent_scale else total
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total": [emitted]}
        )

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_dedup_keys(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    watermark: str = "2 hours",
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming first-occurrence-per-key dedup, two state tiers.

    DEFAULT (bounded, the only safe posture at 100 TB):
    ``dropDuplicatesWithinWatermark`` guarantees dedup among rows whose
    event times fall within the watermark delay of each other; state is
    time-evicted, so unbounded key domains are safe, at the cost of
    re-emitting a key whose duplicates arrive further apart than the
    horizon. Within a single micro-batch the dedup is exact regardless
    of the horizon (state evicts only at batch boundaries).

    ``within_watermark=False`` (exact, GLOBAL — opt-in): plain
    ``dropDuplicates`` emits each key combination exactly once for the
    stream's lifetime. State is one row per distinct key and is NOT
    watermark-evicted — the engine only ages dedup state when the
    event-time column is part of the dedup key, and adding it would
    change the semantics to per-timestamp dedup. Bounded by key
    CARDINALITY, not time: only opt in for enumerable key domains
    (user×event_type); on an unbounded domain this tier's state grows
    without limit, which is why it is no longer the default.
    """
    src = events.withWatermark(ts_col, watermark).select(*keys, ts_col)
    if within_watermark:
        deduped = src.dropDuplicatesWithinWatermark(list(keys))
    else:
        deduped = src.dropDuplicates(list(keys))
    return deduped.select(*keys)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    right_key: str,
    left_ts: str = "ts",
    right_ts: str = "rts",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join bounded by an event-time interval:
    pairs (l, r) with equal keys and ``l.ts <= r.rts < l.ts + horizon``.

    Both sides carry watermarks and the join condition brackets the two
    event-time columns from BOTH directions — that is what lets the
    micro-batch engine compute, per side, the oldest row that can still
    find a partner, and drop buffered state older than it. An unbounded
    condition would buffer both streams forever. Column names on the
    two sides must be disjoint (re-project the right side before calling).
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) < F.col(left_ts) + F.expr(f"INTERVAL {horizon}"))
    )
    return l.join(r, cond, "inner")


def sliding_window_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "4 hours",
    streaming: bool = True,
    value_col: str = "value",
) -> DataFrame:
    """Sliding (overlapping) window counts: each event lands in
    duration/slide windows. Same state-store/watermark contract as the
    tumbling form; the fan-out happens in the grouping expression (one
    state row per (window, key)), not by replicating input rows.
    """
    src = events.withWatermark(ts_col, watermark) if streaming else events
    return (
        src.groupBy(
            F.window(F.col(ts_col), window, slide).alias("w"),
            F.col(key_col),
        )
        .agg(
            F.count("*").alias("n_events"),
            # finite-values policy (functions/scalar.py:finite_or_null):
            # one NaN/Inf row must not poison (or, under ANSI decimal
            # casts, kill) an unbounded streaming aggregation
            F.sum(finite_or_null(value_col).cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            "n_events",
            "sum_value",
        )
    )
