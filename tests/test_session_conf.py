"""Session factory contract: UTC pinning and its NTZ-inference coupling."""

from __future__ import annotations

import pytest

from sql_database_to_elastic_datalake_spark.session import (
    ensure_session_conf,
    get_spark,
)


def test_non_utc_timezone_override_rejected(spark):
    with pytest.raises(ValueError, match="pinned to UTC"):
        get_spark(extra_conf={"spark.sql.session.timeZone": "America/New_York"})


def test_engine_conf_applied(spark):
    ensure_session_conf(spark)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert (
        spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled") == "false"
    )


def test_rocksdb_state_store_tier(spark, tmp_path):
    """The production streaming tier — THE DEFAULT since r5 (decided by
    the sf1 A/B in scripts/bench_streaming_state.py): engine sessions
    start on the RocksDB provider (bounded-memory state — the only safe
    posture for billion-key state at 100 TB). Pin the default, prove a
    stateful query actually executes under it, and confirm
    enable_rocksdb_state_store still converges an external session."""
    import os

    from pyspark.sql import functions as F

    from sql_database_to_elastic_datalake_spark.session import (
        ROCKSDB_STATE_STORE_CONF,
        enable_rocksdb_state_store,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    # the engine-built session fixture already defaults to RocksDB
    assert spark.conf.get(key) == ROCKSDB_STATE_STORE_CONF[key]
    before = spark.conf.get(key, None)
    try:
        enable_rocksdb_state_store(spark)
        assert spark.conf.get(key) == ROCKSDB_STATE_STORE_CONF[key]

        src = os.path.join(str(tmp_path), "src")
        spark.createDataFrame(
            [("a",), ("a",), ("b",)], "k string"
        ).write.parquet(src)
        q = (
            spark.readStream.schema("k string").parquet(src)
            .groupBy("k").agg(F.count("*").alias("n"))
            .writeStream.format("memory").queryName("t_rocksdb")
            .outputMode("complete")
            .option(
                "checkpointLocation", os.path.join(str(tmp_path), "ck")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {r["k"]: r["n"] for r in spark.sql(
            "select * from t_rocksdb").collect()}
        assert got == {"a": 2, "b": 1}
    finally:
        if before is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, before)
