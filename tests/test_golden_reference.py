"""Golden-data parity: run the full pipeline on the REAL reference CSVs
(the Kaggle walmart-recruiting archives shipped in the reference repo) and
assert the reference's published numbers byte-for-byte where integral and to
documented precision where float:

- logs/pipeline.log: train rows=421570 dup=0, features rows=8190 with
  "High null fraction in MarkDown2: 64.33%", stores rows=45; curated table
  rows sales_curated=421570, agg_store_dept=100181, agg_store_type_year=9,
  holidays_vs_normal=6.
- testing/sql_queries.ipynb: 19 curated columns (exact names/order), top-10
  stores by SUM(weekly_sales) (store 20 ≈ 3.013978e8, ...), and
  AVG(weekly_sales) by store type (A 20099.568043 / B 12237.075977 /
  C 9519.532538).

The acquisition stage (archive extraction + retention/quarantine) is the
same sources.acquire path the reference's ingestion uses
(/root/reference/src/ingestion_kaggle.py:94-132).
"""

from __future__ import annotations

import shutil
import sqlite3
from pathlib import Path

import pytest

from walmart_retail_pyspark_sqlite_pipeline_spark.pipeline import (
    PipelineConfig,
    run_pipeline,
)
from walmart_retail_pyspark_sqlite_pipeline_spark.sources.acquire import (
    extract_archives,
    retain_files,
)

REF_RAW = Path("/root/reference/data/raw")

# testing/sql_queries.ipynb cell "Total Sales" — 7 significant figures
GOLDEN_TOP_STORES = [
    (20, 3.013978e8),
    (4, 2.995440e8),
    (14, 2.889999e8),
    (13, 2.865177e8),
    (2, 2.753824e8),
    (10, 2.716177e8),
    (27, 2.538559e8),
    (6, 2.237561e8),
    (1, 2.224028e8),
    (39, 2.074455e8),
]

# testing/sql_queries.ipynb cell "Average Sales"
GOLDEN_AVG_BY_TYPE = {"A": 20099.568043, "B": 12237.075977, "C": 9519.532538}

pytestmark = pytest.mark.skipif(
    not (REF_RAW / "train.csv.zip").exists(),
    reason="reference raw data not present",
)


@pytest.fixture(scope="module")
def golden_run(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("golden_raw")
    for fname in ("train.csv.zip", "features.csv.zip", "stores.csv"):
        shutil.copy(REF_RAW / fname, raw / fname)
    extract_archives(raw)
    kept = retain_files(raw, ["train.csv", "features.csv", "stores.csv"])
    assert {p.name for p in kept} == {"train.csv", "features.csv", "stores.csv"}

    db = tmp_path_factory.mktemp("golden_out") / "retail_pipeline.db"
    result = run_pipeline(spark, PipelineConfig(raw_dir=str(raw), output_db=str(db)))
    return result, db


def test_golden_row_counts_and_qc(golden_run):
    result, _ = golden_run
    reports, table_rows = result["reports"], result["table_rows"]

    assert reports["train"].row_count == 421570
    assert reports["train"].duplicate_count == 0
    assert reports["features"].row_count == 8190
    assert reports["stores"].row_count == 45
    # MarkDown2 64.33% null (pipeline.log warning), to the log's 2 decimals
    assert round(reports["features"].null_fractions["MarkDown2"] * 100, 2) == 64.33
    assert any("MarkDown2" in i for i in reports["features"].issues)

    assert table_rows["sales_curated"] == 421570
    assert table_rows["agg_store_dept"] == 100181
    assert table_rows["agg_store_type_year"] == 9
    assert table_rows["holidays_vs_normal"] == 6


def test_golden_notebook_queries(golden_run):
    _, db = golden_run
    con = sqlite3.connect(db)

    cols = [r[1] for r in con.execute("PRAGMA table_info(sales_curated)")]
    assert cols == [
        "date", "year", "month", "week", "store_id", "department_id",
        "weekly_sales", "is_holiday", "temperature_f", "fuel_price",
        "markdown_1", "markdown_2", "markdown_3", "markdown_4", "markdown_5",
        "cpi", "unemployment_rate", "store_type", "store_size",
    ]

    top = con.execute(
        "SELECT store_id, SUM(weekly_sales) AS total_sales FROM sales_curated "
        "GROUP BY store_id ORDER BY total_sales DESC LIMIT 10"
    ).fetchall()
    assert [s for s, _ in top] == [s for s, _ in GOLDEN_TOP_STORES]
    for (_, got), (_, want) in zip(top, GOLDEN_TOP_STORES):
        # notebook shows 7 significant figures -> its precision is 50 units
        assert got == pytest.approx(want, abs=51)

    avgs = dict(
        con.execute(
            "SELECT store_type, AVG(weekly_sales) FROM sales_curated "
            "GROUP BY store_type"
        ).fetchall()
    )
    for t, want in GOLDEN_AVG_BY_TYPE.items():
        # float AVG over 421k rows: summation order differs from the
        # reference run, so grant ~1e-7 relative beyond the printed value
        assert avgs[t] == pytest.approx(want, abs=5e-3)
    con.close()
