"""Registry contract tests: every query runs at sf0.001 with a stable
schema, oracle strings are valid DuckDB SQL, and column names line up —
the properties the driver's correctness gate depends on. (Exact value
parity is checked by tools/oracle_check.py, which is too slow for the
default pytest loop.)"""

import duckdb
import pytest

from tests.conftest import SF_SMALL
from tools.oracle_check import duck_con
from walmart_retail_pyspark_sqlite_pipeline_spark.plans import (
    oracle_sql_map,
    queries_map,
)

QUERIES = queries_map()
ORACLES = oracle_sql_map()

#: queries whose full run is slow-ish; still covered by oracle_check
_SMOKE_ONLY: set[str] = set()


def test_every_query_has_oracle_or_documented_exception():
    missing = set(QUERIES) - set(ORACLES)
    assert missing == set(), f"queries without oracle SQL: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_and_columns_match_oracle(spark, name):
    df = QUERIES[name](spark, SF_SMALL)
    n = df.count()
    assert n >= 0
    if name in ORACLES:
        con = duck_con(SF_SMALL)
        res = con.execute(ORACLES[name])
        duck_cols = [d[0] for d in res.description]
        assert sorted(df.columns) == sorted(duck_cols), (
            f"{name}: spark columns {sorted(df.columns)} != "
            f"oracle columns {sorted(duck_cols)}"
        )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    assert len(rows) == 10
