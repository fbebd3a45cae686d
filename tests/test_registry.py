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
    REGISTRY,
    all_specs,
    queries_map,
)

# all_specs includes the local-only registry (strict sub-plans / alternate
# surfaces kept out of the driver's 50-query window but oracle-checked here)
SPECS = all_specs(include_local=True)
QUERIES = {n: s.fn for n, s in SPECS.items()}
ORACLES = {n: s.oracle for n, s in SPECS.items() if s.oracle is not None}


def test_exported_registry_fits_driver_window():
    # the driver grades at most 50 queries; everything beyond that budget
    # must live in LOCAL_REGISTRY instead
    queries_map()
    assert len(REGISTRY) <= 50, (
        f"exported registry has {len(REGISTRY)} queries; move sub-plans to "
        "register_local so the driver window covers every exported query"
    )

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
