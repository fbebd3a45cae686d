"""Planted-data tests for time-series operators whose exactness claims
depend on arithmetic width, not just on the driver data's value range."""

from __future__ import annotations

import datetime
import tempfile

import duckdb

from walmart_retail_pyspark_sqlite_pipeline_spark.plans.timeseries import (
    ANOMALY_ZSCORE_SQL,
    events_anomaly_zscore,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_zscore_moments_survive_old_bigint_wrap(spark):
    """Daily totals of ~4.5e8 cents/day/key sit past the old BIGINT-moment
    wrap boundary (49x^2 > 2^63): with the pre-round-6 integer moments Spark
    silently wrapped here while DuckDB raised. The DECIMAL moments must (a)
    run on both engines and (b) produce identical z-scores."""
    rows = []
    for i in range(10):
        ts = datetime.datetime(2025, 4, 1 + i, 12, 0, 0)
        # 4.5M..4.59M dollars/day -> 4.5e8..4.59e8 cents/day, all exact
        # in double (integer-valued)
        rows.append((i, ts, 1, "purchase", 4_500_000.0 + i * 10_003.0, "{}"))
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = events_anomaly_zscore(spark, d).collect()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet/*.parquet')"
        )
        want = con.execute(ANOMALY_ZSCORE_SQL).fetchall()

    assert len(got) == 10 and len(want) == 10
    # day 1 has n=1 -> NULL z; every later day must have a real z (a wrap
    # would have produced negative variance -> NULL, or a wrong value)
    spark_z = [r.zscore for r in got]
    duck_z = [w[3] for w in want]
    assert spark_z[0] is None and duck_z[0] is None
    assert all(z is not None for z in spark_z[1:]), spark_z
    assert spark_z == duck_z, list(zip(spark_z, duck_z))
    assert [r.cents for r in got] == [w[2] for w in want]


def test_cusum_flags_planted_level_shift_and_stays_quiet_on_noise(spark):
    """30 flat days then 30 days at a higher level: drawup accumulates
    linearly after the shift and must cross the 5-mean-day threshold well
    before the series ends, while a steady-noise type never flags. Both
    engines must agree cell-for-cell (exact-integer cumsum/min)."""
    import duckdb as _duck

    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.timeseries import (
        CUSUM_SQL,
        events_cusum_changepoint,
    )

    rows = []
    eid = 0
    for i in range(60):
        ts = datetime.datetime(2025, 1, 1, 12) + datetime.timedelta(days=i)
        level = 100.0 if i < 30 else 160.0  # +60% sustained shift
        rows.append((eid, ts, 1, "shifted", level, "{}")); eid += 1
        noise = 100.0 + (7.0 if i % 2 else -7.0)  # zero-mean alternation
        rows.append((eid, ts, 1, "steady", noise, "{}")); eid += 1
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = events_cusum_changepoint(spark, d).collect()
        con = _duck.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet/*.parquet')"
        )
        want = con.execute(CUSUM_SQL).fetchall()

    assert [
        (r.event_type, str(r.day), r.cents, r.cusum_scaled, r.drawup_scaled, r.is_shift)
        for r in got
    ] == [(w[0], str(w[1]), w[2], w[3], w[4], w[5]) for w in want]
    shifted = [r for r in got if r.event_type == "shifted"]
    steady = [r for r in got if r.event_type == "steady"]
    assert any(r.is_shift for r in shifted), "sustained shift never flagged"
    # the flag must only appear after the change point (day >= 31)
    first_flag = min(r.day for r in shifted if r.is_shift)
    assert first_flag >= datetime.date(2025, 1, 31), first_flag
    assert not any(r.is_shift for r in steady), "noise-only series flagged"
