"""SCD Type-2 dimension maintenance (operators/scd.py): version chains,
no-churn on unchanged rows, point-in-time reconstruction."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from walmart_retail_pyspark_sqlite_pipeline_spark.operators.scd import (
    scd2_apply,
    scd2_as_of,
    scd2_init,
)

KEYS = ["store_id"]
TRACK = ["store_type", "store_size"]


def _snap(spark, rows):
    return spark.createDataFrame(
        [Row(store_id=i, store_type=t, store_size=s) for i, t, s in rows]
    )


def test_scd2_versions_and_as_of(spark):
    h0 = scd2_init(
        _snap(spark, [(1, "A", 100), (2, "B", 200)]), KEYS, TRACK,
        "2024-01-01 00:00:00",
    )
    # day 2: store 1 re-typed, store 2 unchanged, store 3 appears
    h1 = scd2_apply(
        h0,
        _snap(spark, [(1, "C", 100), (2, "B", 200), (3, "A", 300)]),
        KEYS, TRACK, "2024-01-02 00:00:00",
    )
    # day 3: store 3 resized; stores 1-2 absent from the batch (no deletion)
    h2 = scd2_apply(
        h1, _snap(spark, [(3, "A", 999)]), KEYS, TRACK, "2024-01-03 00:00:00"
    ).cache()

    rows = {(r.store_id, str(r.effective_from)): r for r in h2.collect()}
    assert len(rows) == 5  # 2 closed versions + 3 open

    # exactly one current row per key
    cur = h2.filter("is_current").collect()
    assert sorted((r.store_id, r.store_type, r.store_size) for r in cur) == [
        (1, "C", 100), (2, "B", 200), (3, "A", 999),
    ]
    # unchanged store 2 never churned a version
    assert h2.filter("store_id = 2").count() == 1

    # closed versions carry contiguous ranges
    v1 = rows[(1, "2024-01-01 00:00:00")]
    assert str(v1.effective_to) == "2024-01-02 00:00:00" and not v1.is_current
    v3 = rows[(3, "2024-01-02 00:00:00")]
    assert str(v3.effective_to) == "2024-01-03 00:00:00" and not v3.is_current

    # point-in-time: as of Jan 2 noon, store 1 is already C, store 3 still 300
    asof = {
        r.store_id: (r.store_type, r.store_size)
        for r in scd2_as_of(h2, "2024-01-02 12:00:00").collect()
    }
    assert asof == {1: ("C", 100), 2: ("B", 200), 3: ("A", 300)}
    # before the first load: nothing
    assert scd2_as_of(h2, "2023-12-31 00:00:00").count() == 0


def test_scd2_null_safe_change_detection(spark):
    schema = "store_id long, store_type string, store_size long"
    h0 = scd2_init(
        spark.createDataFrame([(1, None, 10)], schema),
        KEYS, TRACK, "2024-01-01 00:00:00",
    )
    # NULL -> value is a change; value -> NULL is a change; NULL -> NULL is not
    h1 = scd2_apply(
        h0,
        spark.createDataFrame([(1, "A", 10)], schema),
        KEYS, TRACK, "2024-01-02 00:00:00",
    )
    assert h1.filter("store_id = 1").count() == 2
    h2 = scd2_apply(
        h1,
        spark.createDataFrame([(1, "A", 10)], schema),
        KEYS, TRACK, "2024-01-03 00:00:00",
    )
    assert h2.filter("store_id = 1").count() == 2  # unchanged: no new version


def test_cdc_apply_partitions_every_key_into_exactly_one_action(spark):
    """Action counts must partition the key space: unchanged + updated +
    deleted = original rows; inserts add 10; delete wins over update on
    keys divisible by both 7 and 13; updated balances carry +$100 each."""
    from tests.conftest import SF_SMALL
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.scd_history import (
        CDC_INSERTS,
        cdc_apply_changes,
    )
    from walmart_retail_pyspark_sqlite_pipeline_spark.sources import read_table

    rows = {r.action: r for r in cdc_apply_changes(spark, SF_SMALL).collect()}
    cust = read_table(spark, SF_SMALL, "customer")
    n = cust.count()
    keys = [r.c_custkey for r in cust.select("c_custkey").collect()]
    n_del = sum(1 for k in keys if k % 13 == 0)
    n_upd = sum(1 for k in keys if k % 13 != 0 and k % 7 == 0)
    assert rows["delete"].n_rows == n_del
    assert rows["update"].n_rows == n_upd
    assert rows["unchanged"].n_rows == n - n_del - n_upd
    assert rows["insert"].n_rows == CDC_INSERTS
    assert rows["insert"].bal_cents_total == 0
    assert rows["delete"].bal_cents_total == 0
