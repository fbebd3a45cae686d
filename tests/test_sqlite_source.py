"""SQLite Python DataSource: sink→source roundtrip, partition-parallel
scan, and filter pushdown (unit-level against the reader, end-to-end
through Spark)."""

import sqlite3

import pyspark.sql.functions as F
import pytest
from pyspark.sql.datasource import EqualTo, GreaterThan, In, IsNull
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from tests.conftest import SF_SMALL
from walmart_retail_pyspark_sqlite_pipeline_spark.sinks import write_sqlite
from walmart_retail_pyspark_sqlite_pipeline_spark.sources import read_sqlite, read_table
from walmart_retail_pyspark_sqlite_pipeline_spark.sources.sqlite_source import (
    SQLiteReader,
)


@pytest.fixture
def small_db(tmp_path):
    db = tmp_path / "unit.db"
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (a INTEGER, b REAL, c TEXT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(i, i / 2.0, None if i % 3 == 0 else f"s{i}") for i in range(10)],
    )
    con.commit()
    con.close()
    return db


def _reader(db, **opts):
    options = {"path": str(db), "table": "t", **opts}
    schema = StructType(
        [
            StructField("a", LongType()),
            StructField("b", DoubleType()),
            StructField("c", StringType()),
        ]
    )
    return SQLiteReader(options, schema)


def test_reader_partitions_cover_rowids(small_db):
    r = _reader(small_db, numpartitions="3")
    parts = r.partitions()
    assert len(parts) == 3
    rows = [row for p in parts for row in r.read(p)]
    assert sorted(x[0] for x in rows) == list(range(10))


def test_reader_pushdown_where(small_db):
    r = _reader(small_db, numpartitions="1")
    rejected = list(
        r.pushFilters(
            [
                GreaterThan(("a",), 5),
                EqualTo(("missing_col",), 1),  # not in schema -> rejected
            ]
        )
    )
    assert len(rejected) == 1 and isinstance(rejected[0], EqualTo)
    rows = list(r.read(r.partitions()[0]))
    assert sorted(x[0] for x in rows) == [6, 7, 8, 9]


def test_reader_pushdown_null_and_in(small_db):
    r = _reader(small_db, numpartitions="2")
    assert list(r.pushFilters([IsNull(("c",)), In(("a",), (0, 3, 5))])) == []
    rows = [row for p in r.partitions() for row in r.read(p)]
    assert sorted(x[0] for x in rows) == [0, 3]  # c IS NULL at multiples of 3


def test_sqlite_roundtrip_through_spark(spark, tmp_path):
    """write_sqlite → read_sqlite must reproduce the normalized frame, with
    the scan split into the requested number of partitions."""
    db = tmp_path / "roundtrip.db"
    orders = read_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    n = write_sqlite(orders, db, "orders_curated")
    back = read_sqlite(spark, db, "orders_curated", num_partitions=4)
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == n == orders.count()
    assert dict(back.dtypes) == {
        "o_orderkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
    }
    assert back.exceptAll(orders).count() == 0
    assert orders.exceptAll(back).count() == 0


def test_sqlite_sink_row_ceiling_guard(spark, tmp_path):
    """Oversized input must fail fast with the parquet-sink pointer and
    leave no committed table — SQLite is the local BI hand-off, not the
    scale sink. The under-limit path through the same ceiling still
    writes and returns the exact count."""
    import pytest
    import sqlite3

    db = tmp_path / "guard.db"
    orders = read_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    with pytest.raises(ValueError, match="parquet"):
        write_sqlite(orders, db, "too_big", max_rows=10)
    con = sqlite3.connect(db)
    try:
        n_rows = con.execute("SELECT COUNT(*) FROM too_big").fetchone()[0]
    finally:
        con.close()
    assert n_rows == 0  # rolled back: the CREATE survived, no rows did
    total = orders.count()
    assert write_sqlite(orders, db, "fits", max_rows=total) == total


def test_sqlite_spark_filter_matches_unfiltered(spark, tmp_path):
    """A filtered read (pushdown path) returns exactly what filtering the
    full scan returns."""
    db = tmp_path / "filtered.db"
    orders = read_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    write_sqlite(orders, db, "orders_curated")
    back = read_sqlite(spark, db, "orders_curated", num_partitions=2)
    pushed = back.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000.0)
    )
    want = orders.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000.0)
    )
    assert pushed.count() == want.count() > 0
    assert pushed.exceptAll(want).count() == 0


def test_sqlite_stream_incremental(spark, tmp_path):
    """Streaming from SQLite with rowid offsets: a second availableNow run
    sharing the first run's checkpoint ships ONLY the rows appended in
    between (exactly-once incremental ingest, no jar)."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.sources import stream_sqlite

    db = tmp_path / "stream.db"
    ckpt = str(tmp_path / "ckpt")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (a INTEGER, c TEXT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, f"s{i}") for i in range(5)]
    )
    con.commit()
    con.close()

    def run_once():
        got: list = []

        def sink(batch_df, batch_id):
            got.extend((r.a, r.c) for r in batch_df.collect())

        q = (
            stream_sqlite(spark, db, "t")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(timeout=120)
        return got

    first = run_once()
    assert sorted(a for a, _ in first) == [0, 1, 2, 3, 4]

    con = sqlite3.connect(db)
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, f"s{i}") for i in range(5, 8)]
    )
    con.commit()
    con.close()

    second = run_once()
    assert sorted(a for a, _ in second) == [5, 6, 7]
