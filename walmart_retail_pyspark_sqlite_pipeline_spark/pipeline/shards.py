"""Training-shard exporter: the last mile between a prepped corpus and a
data loader.

Takes the ``(split, lang)``-partitioned corpus that
``pipeline/corpus.py`` writes and produces loader-ready shards:

1. **sequence assignment** — concat-and-chop packing per split (the
   ``corpus_pack_tokens`` rule: cumulative token offsets over a
   deterministic doc order, chopped into ``seq_len`` windows), so every
   doc row carries ``(seq_id, seq_offset)`` and a loader can assemble
   fixed-length contexts without re-tokenizing;
2. **size-capped shard files** — one parquet write partitioned by
   ``split`` with ``maxRecordsPerFile`` bounding shard size regardless of
   upstream partitioning (stragglers and tiny shards are what kill
   loader throughput);
3. **manifest** — ``_manifest.json`` (underscore prefix: Spark data
   readers skip it) with per-split shard files, row
   counts and token totals, computed from the WRITTEN data (one cheap
   metadata-shaped job over ``input_file_name()``), so the manifest can
   never drift from the bytes on disk. Loaders use it for length-aware
   scheduling and integrity checks.

Determinism: doc order inside a split is ``doc_id`` — two exports of the
same corpus produce identical sequence assignments and manifests.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass
class ShardConfig:
    corpus_dir: str  # output of run_corpus_pipeline (split/lang partitioned)
    output_dir: str
    seq_len: int = 512
    records_per_shard: int = 1000


def export_training_shards(spark: SparkSession, cfg: ShardConfig) -> dict:
    corpus = spark.read.parquet(cfg.corpus_dir)

    w = (
        Window.partitionBy("split")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("tok_start")
    seq_id = ((cum - F.col("n_tokens")) / cfg.seq_len).cast("long")
    out = corpus.select(
        "doc_id",
        "split",
        "lang",
        "n_tokens",
        seq_id.alias("seq_id"),
        (start - seq_id * cfg.seq_len).alias("seq_offset"),
        "text",
    )

    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", cfg.records_per_shard)
        .partitionBy("split")
        .parquet(cfg.output_dir)
    )

    # manifest from the WRITTEN data: per shard file row/token counts
    written = spark.read.parquet(cfg.output_dir)
    per_file = (
        written.groupBy(
            "split", F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file")
        )
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_tokens").alias("tokens"),
            F.max("seq_id").alias("max_seq_id"),
        )
        .orderBy("split", "file")
        .collect()
    )
    manifest = {"seq_len": cfg.seq_len, "records_per_shard": cfg.records_per_shard,
                "splits": {}}
    for r in per_file:
        s = manifest["splits"].setdefault(
            r["split"], {"shards": [], "rows": 0, "tokens": 0, "sequences": 0}
        )
        s["shards"].append({"file": r["file"], "rows": r["rows"], "tokens": r["tokens"]})
        s["rows"] += r["rows"]
        s["tokens"] += int(r["tokens"])
        s["sequences"] = max(s["sequences"], int(r["max_seq_id"]) + 1)
    path = os.path.join(cfg.output_dir, "_manifest.json")
    with open(path, "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return manifest
