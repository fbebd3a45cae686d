"""Planted-data behavioral tests for the retrieval / projection operators
added in round 8: BM25 top-k and the JL sign projection."""

from __future__ import annotations

import tempfile

from tests.conftest import SF_SMALL
from walmart_retail_pyspark_sqlite_pipeline_spark.plans.llm import (
    JL_K,
    embeddings_jl_projection,
    text_bm25_topk,
)


def _write_docs(spark, d, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")


def test_bm25_ranks_tf_saturation_and_length_norm(spark):
    """A short doc with tf=3 of a query term must outrank a long doc with
    tf=1; docs with no query terms are absent; multi-term matches report
    n_terms correctly. (Query terms: spark, join, window.)"""
    filler = "alpha beta gamma delta epsilon zeta eta theta " * 4
    rows = [
        (1, "spark spark spark scan", "en", "src0", 0),
        (2, "spark " + filler, "en", "src0", 0),
        (3, "completely unrelated filler text here", "en", "src0", 0),
        (4, "join window merge", "en", "src0", 0),
        (5, filler, "en", "src0", 0),
        (6, filler + " omega", "en", "src0", 0),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, d, rows)
        got = {r.doc_id: r for r in text_bm25_topk(spark, d).collect()}
    assert set(got) == {1, 2, 4}, got  # 3/5/6 match no query term
    assert got[1].n_terms == 1 and got[2].n_terms == 1 and got[4].n_terms == 2
    # tf saturation + length normalization: doc 1 far above doc 2
    assert got[1].score_micro > got[2].score_micro > 0
    # ranks are dense 1..3 ordered by score desc
    by_rank = sorted(got.values(), key=lambda r: r.rk)
    assert [r.rk for r in by_rank] == [1, 2, 3]
    scores = [r.score_micro for r in by_rank]
    assert scores == sorted(scores, reverse=True)


def test_jl_projection_exact_on_planted_axes(spark):
    """v2 = 2*v1 along one axis: the projection is linear, so the (v1, v2)
    pair distorts by EXACTLY 1.0 (ratio_ppm == 1_000_000); the (v1, v3)
    cross-axis pair must equal the hand-computed sign-disagreement count."""
    e0 = [1.0] + [0.0] * 63
    e0x2 = [2.0] + [0.0] * 63
    e1 = [0.0, 1.0] + [0.0] * 62
    df = spark.createDataFrame(
        [(0, e0, 0), (1, e0x2, 0), (2, e1, 0)],
        "vec_id long, embedding array<float>, label long",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
        got = {(r.va, r.vb): r for r in embeddings_jl_projection(spark, d).collect()}
    m = 1_000_000
    r01 = got[(0, 1)]
    assert r01.d2_orig == m * m
    assert r01.d2_proj == JL_K * m * m
    assert r01.ratio_ppm == 1_000_000
    # cross-axis pair: d2_proj = 4 * m^2 * (# j where s(0,j) != s(1,j))
    def sign(i, j):
        return 1 - 2 * (((i * 1103 + j * 907 + i * j * 751) % 97) % 2)

    disagree = sum(1 for j in range(JL_K) if sign(0, j) != sign(1, j))
    r02 = got[(0, 2)]
    assert r02.d2_orig == 2 * m * m
    assert r02.d2_proj == 4 * m * m * disagree
    # ratio_ppm is the sign-safe DIV-round of d2_proj*1e6 / (k*d2_orig)
    assert r02.ratio_ppm == (2_000_000 * r02.d2_proj + JL_K * r02.d2_orig) // (
        2 * JL_K * r02.d2_orig
    )
    # = disagree/8 in ppm: 4m^2*disagree / (16 * 2m^2), exact at 125000/step
    assert r02.ratio_ppm == disagree * 1_000_000 // (JL_K // 2)


def test_semantic_ivf_separates_planted_groups_and_prunes_dups(spark):
    """Two tight planted groups (near e0, near e1) with a verbatim dup in
    each: every verbatim dup must be pruned (cosine 1.0 with a smaller
    vec_id in its own tight group), and the per-cluster integers must be
    self-consistent (sum n_vecs == n, n_kept == n_vecs - n_pruned)."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.llm import (
        dedup_semantic_ivf,
    )

    def vec(axis, eps, flip):
        v = [0.0] * 64
        v[axis] = 1.0
        v[(axis + 7) % 64] = eps * flip
        return v

    rows = []
    vid = 0
    for axis in (0, 1):
        for k in range(6):
            rows.append((vid, vec(axis, 0.02 * (k % 3), 1 if k % 2 else -1), axis))
            vid += 1
        # verbatim duplicate of the group's first vector (higher vec_id)
        rows.append((vid, vec(axis, 0.0, 1), axis))
        vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
        out = dedup_semantic_ivf(spark, d).collect()
        # group membership per cluster, via the final assignment implied by
        # cluster stats + a direct recomputation of axis per seed id
        got_n = sum(r.n_vecs for r in out)
    assert got_n == len(rows)
    for r in out:
        assert r.n_kept == r.n_vecs - r.n_pruned
        assert r.n_pruned <= r.n_vecs
    # the two verbatim dups (cosine exactly 1.0 with a smaller-id twin in
    # the same tight group) must be pruned somewhere
    assert sum(r.n_pruned for r in out) >= 2


def test_rerank_cascade_equals_exact_when_pool_covers_corpus(spark):
    """With corpus size <= RERANK_POOL the candidate pool is the whole
    corpus, so the cascade MUST equal the direct exact top-k: every row
    in_exact_topk=True and ranks dense in descending rounded-cosine
    order. (The int8 stage can only lose candidates when the pool
    truncates — this pins the no-truncation contract.)"""
    import tempfile

    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.llm import (
        ann_rerank_two_stage,
    )

    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((40, 64)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]], 0) for i in range(40)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
        got = ann_rerank_two_stage(spark, d).collect()
    assert [r.rk for r in got] == list(range(1, 11))
    assert all(r.in_exact_topk for r in got), got
    cosines = [r.cos for r in got]
    assert cosines == sorted(cosines, reverse=True)


def test_image_ann_exact_dup_ranks_first_and_zero_norm_excluded(spark):
    """An identical-text document (identical stub payload -> identical
    histogram) must rank first with cosine exactly 1.0; an empty-text
    document (all-zero histogram) must be excluded by the zero-norm
    guard, not ranked with a NaN cosine."""
    import tempfile

    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.llm import (
        multimodal_image_ann,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "src0", 0),
        (1, "the quick brown fox jumps over the lazy dog", "en", "src0", 0),
        (2, "", "en", "src0", 0),
        (3, "zzzzzzzz 00000000 !!!!!!!!", "en", "src0", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = multimodal_image_ann(spark, d).collect()
    ids = [r.doc_id for r in got]
    assert 2 not in ids, "zero-norm (empty payload) doc must be excluded"
    assert got[0].doc_id == 1 and got[0].cos == 1.0
