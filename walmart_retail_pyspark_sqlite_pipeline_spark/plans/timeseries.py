"""Time-series operators over the events table: dense gap-fill with
last-observation-carried-forward, and value-range (RANGE frame) rolling
aggregates.

Both are classic hypertable/time-series-engine surfaces re-expressed as
Spark window plans. Money-valued aggregates follow the repo's exact-sum
discipline (integer cents, never hashed floats); see plans/registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import read_table
from .registry import QuerySpec, register, register_local


# ---------------------------------------------------------------------------
# events_gapfill_locf — densify each user's activity to one row per calendar
# day over the table's full date span, then forward-fill the day's revenue
# (last observation carried forward) across the gap days.
#
# Plan shape: the day grid is generated distributedly (per-user
# sequence+explode, no driver loop; the 1-row global date bounds are a
# broadcast singleton cross join), the observed per-user-day aggregate is one
# shuffle on (user_id, d), the grid left-joins it on the same key, and LOCF
# is a running last(ignorenulls) window — a second shuffle on user_id. At
# 100 TB the grid is users x days rows, which is *smaller* than the event
# table it summarizes; nothing here is quadratic and no step collects.
#
# Leading days before a user's first event stay NULL (nothing to carry);
# both engines agree on that by construction.
# ---------------------------------------------------------------------------
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    bounds = ev.agg(
        F.min("d").alias("dmin"), F.max("d").alias("dmax")
    )
    grid = (
        ev.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(
                F.sequence("dmin", "dmax", F.expr("interval 1 day"))
            ).alias("d"),
        )
    )
    obs = ev.groupBy("user_id", "d").agg(
        F.count("*").alias("n"), F.sum("cents").alias("cents")
    )
    locf = Window.partitionBy("user_id").orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        grid.join(obs, ["user_id", "d"], "left")
        .select(
            "user_id",
            "d",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.last("cents", ignorenulls=True).over(locf).alias("filled_cents"),
        )
        .orderBy("user_id", "d")
    )


GAPFILL_SQL = """
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
b AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax FROM ev),
grid AS (
  SELECT u.user_id, CAST(gs.g AS DATE) AS d
  FROM (SELECT DISTINCT user_id FROM ev) u
  CROSS JOIN (
    SELECT unnest(generate_series(dmin, dmax, INTERVAL 1 DAY)) AS g FROM b
  ) gs
),
obs AS (
  SELECT user_id, d, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
  FROM ev GROUP BY user_id, d
)
SELECT g.user_id, g.d,
  COALESCE(o.n, 0) AS n_events,
  last_value(o.cents IGNORE NULLS) OVER (
    PARTITION BY g.user_id ORDER BY g.d
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS filled_cents
FROM grid g
LEFT JOIN obs o ON g.user_id = o.user_id AND g.d = o.d
ORDER BY g.user_id, g.d
"""


# ---------------------------------------------------------------------------
# events_range_rolling — per event, activity over the PRECEDING 10 minutes
# of *event time*: a RANGE frame keyed on epoch seconds, not a ROWS frame
# (q18's form). The frame is defined by the ordering value, so rows sharing
# a second are peers and the result is deterministic without a tiebreak —
# and it is exactly the semantics a time-series engine's "rolling 10m"
# gives. One shuffle on user_id; the window sort is the only extra work.
# ---------------------------------------------------------------------------
def events_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("ts_s"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_s",
        F.count("*").over(w).alias("n_10m"),
        F.sum("cents").over(w).alias("cents_10m"),
    ).orderBy("event_id")


RANGE_ROLLING_SQL = """
WITH ev AS (
  SELECT event_id, user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id, ts_s,
  COUNT(*) OVER w AS n_10m,
  CAST(SUM(cents) OVER w AS BIGINT) AS cents_10m
FROM ev
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts_s
  RANGE BETWEEN 600 PRECEDING AND CURRENT ROW
)
ORDER BY event_id
"""


# round-4 rotation: promoted (first hard-signal row for TS1 gap-fill)
register(
    QuerySpec(
        "events_gapfill_locf",
        events_gapfill_locf,
        GAPFILL_SQL,
        ("TS1",),
        doc="dense per-user day grid + LOCF forward fill",
    )
)

for _spec in [
    QuerySpec(
        "events_range_rolling",
        events_range_rolling,
        RANGE_ROLLING_SQL,
        ("W4",),
        doc="RANGE-frame rolling 10-minute window on event time",
    ),
]:
    register_local(_spec)
