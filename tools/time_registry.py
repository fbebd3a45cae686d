"""Round-14 optimization census: time EVERY registry query at sf0.1 with
the noop sink (guide §1.4), warm shingle index resident (the bench's warm
protocol — the index is the one shared materialization), one warm-up +
min-of-2 timed runs per query. Output: name, seconds, sorted desc.

Usage: python tools/time_registry.py [sf_dir] [out_file]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from walmart_retail_pyspark_sqlite_pipeline_spark.plans.registry import (  # noqa: E402
    all_specs,
)
from walmart_retail_pyspark_sqlite_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else REPO / "plans" / "r14" / "_census.txt"
    spark = get_spark("time-registry")
    spark.sparkContext.setLogLevel("ERROR")

    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.llm import _doc_shingles

    _doc_shingles(spark, sf_dir).count()

    rows: list[tuple[str, float]] = []
    specs = all_specs(include_local=True)
    for i, (name, spec) in enumerate(sorted(specs.items())):
        spark.sparkContext.setJobDescription(name)
        try:
            best = float("inf")
            for lap in range(2):  # lap 0 = warm-up; census is for OUTLIER
                t0 = time.perf_counter()  # detection, not precision timing
                spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                if lap:
                    best = min(best, dt)
            rows.append((name, best))
            print(f"[{i + 1}/{len(specs)}] {name:45s} {best:7.3f}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"[{i + 1}/{len(specs)}] {name:45s} ERROR {exc}", flush=True)
            rows.append((name, float("nan")))
    rows.sort(key=lambda r: -(r[1] if r[1] == r[1] else 1e9))
    with open(out, "w") as fh:
        for name, sec in rows:
            fh.write(f"{sec:8.3f}  {name}\n")
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
