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


def test_rotation_never_orphans_a_capability_tag():
    """Every SURVEY §2 / extension tag owned by ANY registry query must keep
    at least one owner in the EXPORTED (driver-graded) window — the
    invariant each round's export rotation has to preserve. Tags whose only
    implementations are strict sub-plans of an exported query are mapped to
    the exported composition that covers them."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.registry import (
        LOCAL_REGISTRY,
        all_specs,
    )

    all_specs()
    exported_tags = {t for s in REGISTRY.values() for t in s.tags}
    # local-only tags covered by an exported composition or by pytest-only
    # surfaces (documented here so a bad rotation fails loudly with a diff)
    covered_elsewhere = {
        "UDTF1",  # text_chunks_udtf: same oracle as exported text_chunks
        "SET1",   # q10 distinct set ops: multiset form exported via q28
        "C10", "C11", "C12", "C13",  # function-surface demos (q24-q26, q33)
        "A3",     # q04: boolean-dim group-by exported via q29 cube
        "G1",     # q09 rollup: exported via q17 grouping sets
        "MM2", "MM3", "MM4", "MM5",  # multimodal plumbing: MM1 exported
        "W2",     # q18 rolling avg: exported via corpus_pack_tokens
        "W3", "W4",  # deep window stacks / RANGE frames: W1 exported
        "A9",     # q21 percentiles: exported via sketch_approx_quantile
        "SIM3", "SIM4", "SIM5", "SIM8",  # ANN variants: SIM2/SIM4 exported
        "SQ2",    # correlated scalar subquery: SQ1 exported
        "J6", "J7",  # market-share join / null-safe join: J1-J5 exported
        "PS1", "H1", "DEC1", "MAP1", "PV2",  # SQL-surface demos
        "TX3", "TX8", "TX9", "TX10", "TX12",  # text metrics: TX1-TX7 exported
        "CP1", "TS5", "IT1", "IT2",  # corpus mix / iterative extensions
        "DD10", "DD14",  # chunk-dedup / entity-match: DD1-DD9 exported
        "DD11",  # canonical-doc selection: composes exported DD9 + local IT2
        "TS6",   # z-score anomaly: TS1/TS4 exported, exact-moment variant
        "PIPE5",  # exact-k weighted sample: PIPE3/PIPE4 sampling exported
        "PIPE6",  # language-balanced exact-k: per-group form of PIPE5
        "TS7", "RJ2",  # session concurrency: TS1/TS4 + RJ1 range-join exported
        "RFM1", "W5",  # RFM quartiles: A1/W1 family exported via q01/q02
        "ST7",   # native session_window: ST2 sessionization exported
        "SIM9", "IT3",  # PCA power iteration: iterative family (DD9/IT2) exported
    }
    orphaned = {
        t
        for s in LOCAL_REGISTRY.values()
        for t in s.tags
        if t not in exported_tags and t not in covered_elsewhere
    }
    assert orphaned == set(), (
        f"rotation orphaned capability tags {sorted(orphaned)}: no exported "
        "query carries them and they are not in the covered-elsewhere list"
    )
