"""Round-14 optimization profiler: decompose the expensive bench queries
into sub-plans and time each with the noop sink (guide §1.4), with the
shared shingle index resident (the bench's warm-index protocol).

Usage: python tools/profile_r14.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from walmart_retail_pyspark_sqlite_pipeline_spark.session import get_spark  # noqa: E402


def t(spark, label, df, n=3):
    spark.sparkContext.setJobDescription(label)
    df.write.mode("overwrite").format("noop").save()  # warm-up
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:55s} {best:7.3f} s")
    spark.sparkContext.setJobDescription(None)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile-r14")
    spark.sparkContext.setLogLevel("ERROR")

    from walmart_retail_pyspark_sqlite_pipeline_spark.plans import llm

    # Materialize the shared shingle index (warm-index protocol)
    idx = llm._doc_shingles(spark, sf_dir)
    n_idx = idx.count()
    print(f"shingle index rows: {n_idx}")

    # --- dedup_minhash_lsh_pairs decomposition ---
    sig = llm._minhash_sig(spark, sf_dir)
    t(spark, "lsh: sig build (groupBy doc, 8 mins)", sig)

    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.concat_ws("_", F.col(f"mh{2*i}"), F.col(f"mh{2*i+1}")).alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    t(spark, "lsh: bands self-join -> distinct cand", cand)
    print(f"  candidates: {cand.count()}")

    sizes = idx.groupBy("doc_id").agg(F.count("*").alias("n"))
    ua = idx.select(F.col("doc_id").alias("doc_a"), F.col("t").alias("t"))
    ub = idx.select(F.col("doc_id").alias("doc_b"), F.col("t").alias("t"))
    common = (
        cand.join(ua, "doc_a")
        .join(ub, ["doc_b", "t"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    t(spark, "lsh: + verify common counts", common)
    full = llm.dedup_minhash_lsh_pairs(spark, sf_dir)
    t(spark, "lsh: FULL (common + sizes joins + filter)", full)

    # --- dedup_ngram_jaccard decomposition ---
    from pyspark.sql.window import Window

    w = Window.partitionBy("sh")
    sh = (
        idx.select("doc_id", F.col("t").alias("sh"))
        .repartition(F.col("sh"))
        .withColumn("df", F.count("*").over(w))
        .filter(F.col("df") <= llm.DOC_FREQ_CAP)
        .drop("df")
    )
    t(spark, "ngram: capped shingle table (repart+window)", sh)
    a2, b2 = sh.alias("a"), sh.alias("b")
    common2 = (
        a2.join(b2, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    t(spark, "ngram: + self-join -> pair counts", common2)
    t(spark, "ngram: FULL", llm.dedup_ngram_jaccard(spark, sf_dir))

    # --- corpus_prep_pipeline decomposition ---
    from walmart_retail_pyspark_sqlite_pipeline_spark.functions import text
    from walmart_retail_pyspark_sqlite_pipeline_spark.sources.tables import read_table

    docs = read_table(spark, sf_dir, "documents")
    tok = text.tokens(F.col("text"))
    scored = docs.select(
        "doc_id",
        "lang",
        F.size(tok).alias("n_tokens"),
        text.quality_score(F.col("text"), tok).alias("quality_score"),
        F.md5("text").alias("h"),
    ).filter(F.col("quality_score") >= llm.QUALITY_MIN)
    t(spark, "prep: scoring scan alone", scored)
    kept = (
        scored.withColumn("keep_id", F.min("doc_id").over(Window.partitionBy("h")))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .drop("h", "keep_id")
    )
    t(spark, "prep: + exact-dup window", kept)
    t(spark, "prep: FULL", llm.corpus_prep_pipeline(spark, sf_dir))

    # --- clf variant ---
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans import corpus

    clf = corpus._qclf_inference(spark, sf_dir)
    t(spark, "clf: inference scan alone", clf)
    t(spark, "clf: FULL pipeline", corpus.corpus_prep_pipeline_clf(spark, sf_dir))

    # --- index build cold (corpus_shingle_index bench line) ---
    spark.catalog.clearCache()
    t(spark, "index: cold build (tok+shingle+distinct+hash)", llm._doc_shingles(spark, sf_dir), n=1)

    spark.stop()


if __name__ == "__main__":
    main()
