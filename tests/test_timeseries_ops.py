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
        # refund-dominated: negative total with mild alternation — under
        # the unguarded 5*t_sum threshold (t_sum < 0) ANY positive drawup
        # would have fired; with 5*GREATEST(ABS(t_sum),1) it must stay
        # quiet (ADVICE r7 inversion guard)
        refund = -100.0 + (7.0 if i % 2 else -7.0)
        rows.append((eid, ts, 1, "refunds", refund, "{}")); eid += 1
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
    refunds = [r for r in got if r.event_type == "refunds"]
    assert refunds and not any(r.is_shift for r in refunds), (
        "refund-dominated (negative-total) series must not flag on noise "
        "drawups — the |t_sum| threshold guard failed"
    )


def test_seasonal_decompose_recovers_planted_weekday_effect(spark):
    """28 consecutive days at $100/day except Mondays at $170: every full
    centered window sums to $770, so the decomposition must report the
    Monday effect as exactly +6000 cents and every other weekday as
    exactly -1000 cents (effects sum to zero across the week), using only
    the 22 interior days. Both engines must agree cell-for-cell."""
    import duckdb as _duck

    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.timeseries import (
        SEASONAL_DECOMPOSE_SQL,
        events_seasonal_decompose,
    )

    rows = []
    for i in range(28):
        day = datetime.datetime(2025, 3, 3, 12) + datetime.timedelta(days=i)
        # 2025-03-03 is a Monday; dow 0 in the query's epoch arithmetic
        value = 170.0 if i % 7 == 0 else 100.0
        rows.append((i, day, 1, "purchase", value, "{}"))
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = events_seasonal_decompose(spark, d).collect()
        con = _duck.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet/*.parquet')"
        )
        want = con.execute(SEASONAL_DECOMPOSE_SQL).fetchall()

    assert [
        (r.event_type, r.dow, r.n_days, r.det7, r.seasonal_cents) for r in got
    ] == want
    by_dow = {r.dow: r for r in got}
    assert set(by_dow) == set(range(7))
    # interior days: i in 3..24 -> 22 days; Mondays among them: i in {7,14,21}
    assert by_dow[0].n_days == 3 and by_dow[0].seasonal_cents == 6000.0
    for dow in range(1, 7):
        assert by_dow[dow].seasonal_cents == -1000.0, by_dow[dow]
    assert sum(r.n_days for r in got) == 22


def test_seasonal_decompose_excludes_gapped_windows(spark):
    """Remove one day from the middle of the series: every centered window
    that TOUCHES the hole now spans more than 6 days and must be excluded
    (rows-vs-days drift protection), shrinking n_days by exactly the 7
    windows centered within +/-3 rows of the hole."""
    import tempfile as _tmp

    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.timeseries import (
        events_seasonal_decompose,
    )

    def run(skip_day):
        rows = []
        for i in range(28):
            if i == skip_day:
                continue
            day = datetime.datetime(2025, 3, 3, 12) + datetime.timedelta(days=i)
            rows.append((i, day, 1, "purchase", 100.0, "{}"))
        df = spark.createDataFrame(rows, EVENT_SCHEMA)
        with _tmp.TemporaryDirectory() as d:
            df.write.mode("overwrite").parquet(f"{d}/events.parquet")
            return events_seasonal_decompose(spark, d).collect()

    full = run(skip_day=None)
    holed = run(skip_day=14)
    assert sum(r.n_days for r in full) == 22
    # day 14 is gone (1 window lost as a center) and days 11..17 minus the
    # hole (6 surviving rows) have invalid windows -> 22 - 7 = 15 remain
    assert sum(r.n_days for r in holed) == 15
    assert all(r.seasonal_cents == 0.0 for r in holed), holed
