from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import Row

from sql_database_to_elastic_datalake_spark import schemas
from sql_database_to_elastic_datalake_spark.sources import jdbc
from sql_database_to_elastic_datalake_spark.streaming import pipeline as sp


# --- streaming -------------------------------------------------------------

def test_stream_windowed_counts_matches_batch(spark, sf_dir):
    stream = sp.read_stream_parquet(spark, sf_dir, glob="events.parquet")
    assert stream.isStreaming
    agg = sp.windowed_counts(stream, window="1 hour")
    got = sp.run_stream_to_memory(agg, "t_win_counts")

    from sql_database_to_elastic_datalake_spark.sources.parquet import load_table

    batch = sp.windowed_counts(
        load_table(spark, sf_dir, "events"), window="1 hour", streaming=False
    )
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert a == b and len(a) > 0


def test_stream_upsert_foreachbatch(spark, tmp_path):
    target = os.path.join(str(tmp_path), "target")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    drop = os.path.join(str(tmp_path), "drop")
    base = spark.createDataFrame(
        [Row(k=1, v="old", ver=1), Row(k=2, v="keep", ver=1)]
    )
    base.write.parquet(target)
    updates = spark.createDataFrame([Row(k=1, v="new", ver=2), Row(k=3, v="ins", ver=2)])
    updates.coalesce(1).write.parquet(drop)

    stream = sp.read_stream_parquet(spark, drop)
    q = sp.stream_upsert_into(stream, target, keys=["k"], version_col="ver", checkpoint=ckpt)
    q.awaitTermination()
    final = {r["k"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert final == {1: "new", 2: "keep", 3: "ins"}


def test_stream_upsert_restart_from_checkpoint(spark, tmp_path):
    """The merge sink across TWO runs sharing one checkpoint: the
    second availableNow run must process only the new drop (offsets
    come from the checkpoint), and the merge target must accumulate
    latest-wins across runs — the incremental-sync deployment shape.
    A regression here (e.g. the target-existence check failing and
    taking the overwrite branch) silently replaces history with the
    newest batch."""
    target = os.path.join(str(tmp_path), "target2")
    ckpt = os.path.join(str(tmp_path), "ckpt2")
    drop = os.path.join(str(tmp_path), "drop2")

    spark.createDataFrame(
        [Row(k=1, v="a1", ver=1), Row(k=2, v="b1", ver=1)]
    ).coalesce(1).write.parquet(drop)

    def run():
        stream = sp.read_stream_parquet(spark, drop)
        q = sp.stream_upsert_into(
            stream, target, keys=["k"], version_col="ver", checkpoint=ckpt
        )
        q.awaitTermination()

    run()
    assert {(r["k"], r["v"]) for r in spark.read.parquet(target).collect()} \
        == {(1, "a1"), (2, "b1")}

    # second drop: update k=1 (newer ver), stale k=2 (older ver), new k=3
    spark.createDataFrame(
        [Row(k=1, v="a2", ver=2), Row(k=2, v="stale", ver=0),
         Row(k=3, v="c1", ver=1)]
    ).coalesce(1).write.mode("append").parquet(drop)
    run()
    final = {r["k"]: (r["v"], r["ver"]) for r in
             spark.read.parquet(target).collect()}
    assert final == {1: ("a2", 2), 2: ("b1", 1), 3: ("c1", 1)}


def test_stream_upsert_partitioned_touches_only_affected(spark, tmp_path):
    """The r5 scale fast path: with partition_col, a micro-batch whose
    rows land in one partition must leave every other partition's FILES
    untouched (dynamic partition overwrite + pruned base read) — the
    property that turns the per-batch cost from O(table) into
    O(touched partitions)."""
    import glob

    target = os.path.join(str(tmp_path), "target3")
    ckpt = os.path.join(str(tmp_path), "ckpt3")
    drop = os.path.join(str(tmp_path), "drop3")

    spark.createDataFrame(
        [Row(k=1, p="a", v="a1", ver=1), Row(k=2, p="b", v="b1", ver=1)]
    ).coalesce(1).write.parquet(drop)

    def run():
        stream = sp.read_stream_parquet(spark, drop)
        q = sp.stream_upsert_into(
            stream, target, keys=["k"], version_col="ver",
            checkpoint=ckpt, partition_col="p",
        )
        q.awaitTermination()

    run()
    assert {(r["k"], r["v"]) for r in spark.read.parquet(target).collect()} \
        == {(1, "a1"), (2, "b1")}

    def files(part):
        return sorted(
            (f, os.path.getmtime(f))
            for f in glob.glob(os.path.join(target, f"p={part}", "*.parquet"))
        )

    a_before = files("a")
    assert a_before, "expected a partitioned p=a directory"

    # second drop touches ONLY partition b (update k=2, insert k=3)
    spark.createDataFrame(
        [Row(k=2, p="b", v="b2", ver=2), Row(k=3, p="b", v="c1", ver=1)]
    ).coalesce(1).write.mode("append").parquet(drop)
    run()

    final = {r["k"]: (r["p"], r["v"]) for r in
             spark.read.parquet(target).collect()}
    assert final == {1: ("a", "a1"), 2: ("b", "b2"), 3: ("b", "c1")}
    # partition a's files: same names, same mtimes — never rewritten
    assert files("a") == a_before


def test_stream_upsert_partitioned_null_partition_merges(spark, tmp_path):
    """NULL partition values: isin([None]) never matches, so without
    the explicit isNull branch the base's null partition would be
    EXCLUDED from the merge while dynamic overwrite still replaced it —
    silent data loss for exactly those rows."""
    target = os.path.join(str(tmp_path), "target4")
    ckpt = os.path.join(str(tmp_path), "ckpt4")
    drop = os.path.join(str(tmp_path), "drop4")

    spark.createDataFrame(
        [Row(k=1, p=None, v="n1", ver=1), Row(k=2, p=None, v="keep", ver=1),
         Row(k=3, p="x", v="x1", ver=1)],
        "k bigint, p string, v string, ver bigint",
    ).coalesce(1).write.parquet(drop)

    def run():
        stream = sp.read_stream_parquet(spark, drop)
        q = sp.stream_upsert_into(
            stream, target, keys=["k"], version_col="ver",
            checkpoint=ckpt, partition_col="p",
        )
        q.awaitTermination()

    run()
    # second drop touches ONLY the null partition: update k=1, keep k=2
    spark.createDataFrame(
        [Row(k=1, p=None, v="n2", ver=2)],
        "k bigint, p string, v string, ver bigint",
    ).coalesce(1).write.mode("append").parquet(drop)
    run()
    final = {r["k"]: (r["p"], r["v"]) for r in
             spark.read.parquet(target).collect()}
    assert final == {1: (None, "n2"), 2: (None, "keep"), 3: ("x", "x1")}


def test_path_exists_resolves_scheme(spark, tmp_path):
    """Hadoop-FS existence: correct for plain local paths AND for
    file:// URIs (the class of target os.path.exists gets wrong for
    every URI scheme — on hdfs://s3a:// it answers False forever and
    the merge sink's first-batch branch overwrites the table each
    micro-batch)."""
    from sql_database_to_elastic_datalake_spark.fs import path_exists

    p = os.path.join(str(tmp_path), "t")
    assert not path_exists(spark, p)
    spark.range(1).write.parquet(p)
    assert path_exists(spark, p)
    assert path_exists(spark, "file://" + p)
    assert not path_exists(spark, "file://" + p + "_absent")
    # os.path.exists would answer False here — the bug class under test
    assert not os.path.exists("file://" + p)


def test_session_counts_gap_boundary(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        Row(user_id=1, ts=t0, value=1.0, event_id=1),
        # exactly at the 30-minute gap: EXTENDS the session (Spark's
        # session_window is inclusive of ts == prev + gap)
        Row(user_id=1, ts=t0 + dt.timedelta(minutes=30), value=1.0, event_id=2),
        # beyond the gap from the previous event: new session
        Row(user_id=1, ts=t0 + dt.timedelta(minutes=61), value=1.0, event_id=3),
    ]
    out = sp.session_counts(
        spark.createDataFrame(rows), gap="30 minutes", streaming=False
    ).collect()
    got = sorted((r["session_start"], r["n_events"]) for r in out)
    assert got == [(t0, 2), (t0 + dt.timedelta(minutes=61), 1)]


# --- jdbc plan construction ------------------------------------------------

def test_quote_identifier_dialects():
    assert jdbc.quote_identifier("Ticket") == '"Ticket"'
    assert jdbc.quote_identifier("Ticket", "mysql") == "`Ticket`"
    assert jdbc.quote_identifier('a"b') == '"a""b"'
    with pytest.raises(ValueError):
        jdbc.quote_identifier("t", "oracle")
    assert jdbc.qualified_table("Ticket", "copy") == '"copy"."Ticket"'


def test_partition_helpers():
    opts = jdbc.range_partition_options("number", 0, 1000, 8)
    assert opts["numPartitions"] == "8" and opts["partitionColumn"] == "number"
    preds = jdbc.hash_partition_predicates('"id"::text', 4)
    assert len(preds) == 4
    assert preds[0] == '(hashtext("id"::text) & 2147483647) % 4 = 0'
    assert jdbc.hash_partition_predicates("id", 2, "mysql")[1] == "crc32(id) % 2 = 1"


def test_schema_search_path_resolution():
    avail = {"copy": {"Ticket"}, None: {"Ticket", "User"}}
    assert jdbc.resolve_table_schema(avail, "Ticket", ("copy", None)) == "copy"
    assert jdbc.resolve_table_schema(avail, "User", ("copy", None)) is None
    with pytest.raises(LookupError):
        jdbc.resolve_table_schema(avail, "Missing", ("copy", None))


# --- schema registry / type ladder -----------------------------------------

def test_entity_schemas_cover_reference_tables():
    assert set(schemas.ENTITY_SCHEMAS) == set(jdbc.TABLES_TO_SYNC)
    for name, st in schemas.ENTITY_SCHEMAS.items():
        cols = [f.name for f in st.fields]
        assert cols[:4] == ["id", "createdAt", "updatedAt", "deletedAt"], name


def test_lake_type_ladder(spark):
    from pyspark.sql import types as T

    assert schemas.lake_type(T.StringType()) == "keyword"
    assert schemas.lake_type(T.IntegerType()) == "long"
    assert schemas.lake_type(T.DoubleType()) == "double"
    assert schemas.lake_type(T.TimestampType()) == "date"
    assert schemas.lake_type(T.ArrayType(T.StringType())) == "nested"
    assert schemas.lake_type(T.MapType(T.StringType(), T.StringType())) == "object"
    m = schemas.lake_mapping(schemas.ENTITY_SCHEMAS["Ticket"])
    assert m["number"] == "long" and m["createdAt"] == "date" and m["data"] == "keyword"


def test_stateful_running_totals_plan(spark, sf_dir):
    """Plan + contract check for the applyInPandasWithState escape hatch."""
    stream = sp.read_stream_parquet(spark, sf_dir, glob="events.parquet")
    totals = sp.running_user_totals_stateful(stream)
    assert totals.isStreaming
    assert totals.schema.simpleString() == (
        "struct<user_id:bigint,n_events:bigint,total:double>"
    )


def test_stateful_running_totals_executes_and_carries_state(spark, tmp_path):
    """Execution test: totals accumulate ACROSS micro-batches via the
    state store (same checkpoint, second availableNow run sees only the
    new file but emits cumulative counts). The historical hang here was
    the handler re-arming its processing-time timer on timeout
    invocations — with that guard in place the query drains reliably.
    """
    import os

    src = os.path.join(str(tmp_path), "src")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    schema = "user_id long, ts timestamp, value double"
    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10), 2.0),
         (1, dt.datetime(2024, 1, 1, 11), 3.0),
         (2, dt.datetime(2024, 1, 1, 10), 5.0)],
        schema,
    ).write.parquet(src)

    def run():
        # foreachBatch, not the memory sink: memory-sink queries refuse
        # to restart from an existing checkpoint, and restart is the
        # point of this test
        rows = []
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            sp.running_user_totals_stateful(stream)
            .writeStream.foreachBatch(
                lambda df, _id: rows.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["user_id"]: (r["n_events"], r["total"]) for r in rows}

    first = run()
    assert first == {1: (2, 5.0), 2: (1, 5.0)}

    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12), 10.0),
         (3, dt.datetime(2024, 1, 1, 12), 1.0)],
        schema,
    ).write.mode("append").parquet(src)
    second = run()
    # only touched keys re-emit, with cumulative values from the store
    assert second == {1: (3, 15.0), 3: (1, 1.0)}

    # eviction: a next-day event pushes the watermark far past user 2's
    # idle horizon (last seen 10:00 + 60 min), firing its event-time
    # timer and dropping its state...
    spark.createDataFrame(
        [(9, dt.datetime(2024, 1, 2, 12), 0.0)], schema
    ).write.mode("append").parquet(src)
    assert run() == {9: (1, 0.0)}

    # ...so when user 2 reappears it accumulates from zero, not from
    # the evicted (1, 5.0)
    spark.createDataFrame(
        [(2, dt.datetime(2024, 1, 2, 13), 7.0)], schema
    ).write.mode("append").parquet(src)
    assert run() == {2: (1, 7.0)}


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join (two watermarked file streams) must
    produce exactly the batch join's rows once both streams drain."""
    import os

    from pyspark.sql import functions as F

    lsrc = os.path.join(str(tmp_path), "l")
    rsrc = os.path.join(str(tmp_path), "r")
    base = dt.datetime(2024, 1, 1, 10)

    def m(minutes):
        return base + dt.timedelta(minutes=minutes)

    lschema = "user_id long, ts timestamp, action string"
    rschema = "r_user long, rts timestamp, outcome string"
    left_rows = [(1, m(0), "a"), (1, m(90), "b"), (2, m(0), "c")]
    right_rows = [
        (1, m(30), "x"),   # joins l(1, 0:00) only
        (1, m(100), "y"),  # joins l(1, 1:30) only
        (2, m(61), "z"),   # outside 1h horizon of l(2, 0:00)
        (3, m(10), "w"),   # no left partner
    ]
    spark.createDataFrame(left_rows, lschema).write.parquet(lsrc)
    spark.createDataFrame(right_rows, rschema).write.parquet(rsrc)

    ls = spark.readStream.schema(lschema).parquet(lsrc)
    rs = spark.readStream.schema(rschema).parquet(rsrc)
    joined = sp.stream_stream_interval_join(
        ls, rs, key="user_id", right_key="r_user",
        left_ts="ts", right_ts="rts", horizon="1 hour",
    )
    assert joined.isStreaming
    got = sorted(
        (r["user_id"], r["action"], r["outcome"])
        for r in sp.run_stream_to_memory(
            joined, "ssj_test", output_mode="append"
        ).collect()
    )
    assert got == [(1, "a", "x"), (1, "b", "y")]

    # differential: identical condition in batch mode
    lb = spark.read.parquet(lsrc)
    rb = spark.read.parquet(rsrc)
    cond = (
        (F.col("user_id") == F.col("r_user"))
        & (F.col("rts") >= F.col("ts"))
        & (F.col("rts") < F.col("ts") + F.expr("INTERVAL 1 hour"))
    )
    want = sorted(
        (r["user_id"], r["action"], r["outcome"])
        for r in lb.join(rb, cond).collect()
    )
    assert got == want


def test_stream_dedup_within_watermark_tier(spark, sf_dir):
    """Bounded-state tier: dropDuplicatesWithinWatermark dedups within
    the horizon; on the single-drop harness data (one micro-batch, all
    rows inside the watermark window relative to each other per key
    group processed together) it emits a superset-of-keys equal to the
    global tier's distinct set here, and the query must run — the
    global tier's state-growth contract is documented, not watermarked."""
    stream = sp.read_stream_parquet(spark, sf_dir, glob="events.parquet")
    deduped = sp.stream_dedup_keys(
        stream, keys=("user_id", "event_type"), watermark="100 days",
        within_watermark=True,
    )
    got = sp.run_stream_to_memory(deduped, "t_dedup_ww", output_mode="append")
    from sql_database_to_elastic_datalake_spark.sources.parquet import load_table

    batch_keys = {
        tuple(r)
        for r in load_table(spark, sf_dir, "events")
        .select("user_id", "event_type").distinct().collect()
    }
    ww_keys = {tuple(r) for r in got.collect()}
    # horizon covers the whole drop → exactly the distinct key set
    assert ww_keys == batch_keys and len(ww_keys) > 0
