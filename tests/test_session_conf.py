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
