"""Streaming near-duplicate gate: the online form of incremental corpus
dedup (``dedup_incremental_near_docs`` runs it nightly; this runs it per
micro-batch).

Design — a ``foreachBatch`` fold over two persisted parquet stores:

- ``state/sig``       minhash signature per seen doc,
- ``state/shingles``  the shingle index of seen docs (needed because LSH
  candidates are *verified* with true Jaccard, and verification must read
  the OLD doc's shingle set),

plus an append-only ``pairs`` output of flagged ``(new_id, old_id,
jaccard)`` matches. Each batch:

1. computes the batch's shingle index + signatures (the reusable
   ``operators/dedup.py`` stages),
2. LSH-band-joins batch signatures against the STORE's signatures only
   (never batch x batch history all-pairs; state grows O(corpus), work
   grows O(batch)),
3. verifies candidates with true Jaccard across batch + store shingles,
4. appends flagged pairs, then appends the batch's sigs/shingles to the
   store.

At scale the two stores are bucketed by band key / shingle so step 2-3
are co-located joins. Exactly-once: foreachBatch can replay a batch after
a crash between the pairs append and the checkpoint commit — production
hardening is the batch-id ledger shown in
``pipeline/incremental.py::rollup_stream_sink``; here batches are assumed
effectively-once (documented, test uses availableNow).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    band_keys,
    minhash_signatures,
    shingle_index,
)


def _store_append(df: DataFrame, path: str) -> None:
    df.write.mode("append").parquet(path)


def near_dup_gate_stream(
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
):
    """Start the streaming near-dup gate; returns the StreamingQuery.

    ``docs_stream`` is any streaming DataFrame with ``id_col``/``text_col``.
    Flagged matches land in ``{state_dir}/pairs`` as they are found.
    """
    sig_dir = os.path.join(state_dir, "sig")
    sh_dir = os.path.join(state_dir, "shingles")
    pairs_dir = os.path.join(state_dir, "pairs")

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sh_new = shingle_index(batch_df, id_col, text_col).localCheckpoint(
            eager=True
        )
        sig_new = minhash_signatures(sh_new, id_col).localCheckpoint(eager=True)

        if os.path.exists(sig_dir):
            sig_old = spark.read.parquet(sig_dir)
            sh_old = spark.read.parquet(sh_dir)
            nb = band_keys(sig_new, id_col).select(
                F.col(id_col).alias("new_id"), "band", "key"
            )
            ob = band_keys(sig_old, id_col).select(
                F.col(id_col).alias("old_id"), "band", "key"
            )
            cand = nb.join(ob, ["band", "key"]).select("new_id", "old_id").distinct()

            sizes_new = sh_new.groupBy(id_col).agg(F.count("*").alias("n"))
            sizes_old = sh_old.groupBy(id_col).agg(F.count("*").alias("n"))
            ua = sh_new.select(F.col(id_col).alias("new_id"), "t")
            ub = sh_old.select(F.col(id_col).alias("old_id"), "t")
            common = (
                cand.join(ua, "new_id")
                .join(ub, ["old_id", "t"])
                .groupBy("new_id", "old_id")
                .agg(F.count("*").alias("common"))
            )
            pairs = (
                common.join(
                    sizes_new.select(
                        F.col(id_col).alias("new_id"), F.col("n").alias("na")
                    ),
                    "new_id",
                )
                .join(
                    sizes_old.select(
                        F.col(id_col).alias("old_id"), F.col("n").alias("nb")
                    ),
                    "old_id",
                )
                .withColumn(
                    "jaccard",
                    F.round(
                        F.col("common").cast("double")
                        / (F.col("na") + F.col("nb") - F.col("common")),
                        6,
                    ),
                )
                .filter(F.col("jaccard") >= threshold)
                .select("new_id", "old_id", "jaccard")
            )
            if pairs.limit(1).count() > 0:
                _store_append(pairs, pairs_dir)

        _store_append(sig_new, sig_dir)
        _store_append(sh_new, sh_dir)

    return (
        docs_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def topk_stream(
    vectors_stream: DataFrame,
    query_vec: list[float],
    state_dir: str,
    checkpoint_dir: str,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Continuous top-k maintenance: fold each micro-batch of new vectors
    into a materialized top-k (``operators/similarity.py::topk_merge``)
    without ever rescanning history — per batch the work is one scoring
    pass over the batch plus a k-row merge (top-k is monotone under
    union, so the store IS the full-corpus answer at every step).

    The store (``{state_dir}/topk``) is a k-row parquet table — at any
    scale this is the "running leaderboard" pattern: score the delta,
    merge, overwrite k rows.
    """
    import os as _os

    from ..functions import vectors as _vectors
    from ..operators.similarity import topk_merge

    topk_dir = _os.path.join(state_dir, "topk")

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        qv = F.array(*[F.lit(float(x)) for x in query_vec])
        scored = batch_df.select(
            F.col(id_col).alias("vec_id"),
            F.round(
                _vectors.cosine(_vectors.as_double(F.col(vec_col)), qv), 6
            ).alias("cos"),
        )
        if _os.path.exists(topk_dir):
            prior = spark.read.parquet(topk_dir)
            merged = topk_merge(prior, scored, k=k)
        else:
            merged = scored.orderBy(F.col("cos").desc(), "vec_id").limit(k)
        # k rows: localCheckpoint breaks lineage to the store files being
        # overwritten, then the overwrite is tiny
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(topk_dir)

    return (
        vectors_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
