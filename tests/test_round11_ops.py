"""Behavioral tests for the round-11 operators on planted data — the
oracle gate proves engine parity on the synthetic corpus; these prove the
semantics do what they claim."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from walmart_retail_pyspark_sqlite_pipeline_spark.plans.corpus import (
    corpus_quality_calibration,
    corpus_soft_dedup_weights,
    text_lm_heldout_perplexity,
)
from walmart_retail_pyspark_sqlite_pipeline_spark.plans.llm import (
    JACCARD_THRESHOLD,
    dedup_minhash_lsh_pairs,
    embeddings_dim_clip_bounds,
    multimodal_audio_vad_segments,
)
from walmart_retail_pyspark_sqlite_pipeline_spark.plans.sketches import (
    sketch_cms_heavy_changers,
)


def test_soft_dedup_weights_invariants(spark):
    rows = corpus_soft_dedup_weights(spark, SF_SMALL).collect()
    assert rows, "empty weight table"
    by_doc = {r.doc_id: r for r in rows}
    # every doc gets a weight; multiplicity >= 1 so 0 < weight <= 1e6
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    assert len(rows) == docs.count()
    for r in rows:
        assert r.n_exact >= 1
        assert r.n_near >= 0
        eff = r.n_exact + r.n_near
        assert r.weight_micro == (2 * 1_000_000 + eff) // (2 * eff)
        assert 0 < r.weight_micro <= 1_000_000
    # near-dup partner counts agree with the verified pair list
    pairs = (
        dedup_minhash_lsh_pairs(spark, SF_SMALL)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .collect()
    )
    expected: dict[int, int] = {}
    for p in pairs:
        expected[p.doc_a] = expected.get(p.doc_a, 0) + 1
        expected[p.doc_b] = expected.get(p.doc_b, 0) + 1
    for doc_id, n in expected.items():
        assert by_doc[doc_id].n_near == n
    # a singleton unique doc weighs exactly 1.0
    singles = [r for r in rows if r.n_exact == 1 and r.n_near == 0]
    assert singles and all(r.weight_micro == 1_000_000 for r in singles)


def test_lm_heldout_scores_only_the_heldout_fold(spark):
    rows = text_lm_heldout_perplexity(spark, SF_SMALL).collect()
    assert rows, "no held-out docs scored"
    assert all(r.doc_id % 10 >= 8 for r in rows)
    # add-one smoothing: every NLL is positive and finite
    assert all(
        r.avg_nll_heldout > 0 and math.isfinite(r.avg_nll_heldout)
        for r in rows
    )
    # a planted unseen bigram must score worse than a train-frequent one:
    # held-out NLL >= the resubstitution NLL on average (train counts
    # cannot over-fit the held-out docs)
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.corpus import (
        text_lm_score,
    )

    resub = {
        r.doc_id: r.avg_nll for r in text_lm_score(spark, SF_SMALL).collect()
    }
    held = {r.doc_id: r.avg_nll_heldout for r in rows}
    common = set(held) & set(resub)
    assert common
    mean_held = sum(held[d] for d in common) / len(common)
    mean_resub = sum(resub[d] for d in common) / len(common)
    assert mean_held >= mean_resub - 0.5  # held-out never dramatically easier


def test_quality_calibration_bins_partition_the_corpus(spark):
    rows = corpus_quality_calibration(spark, SF_SMALL).collect()
    assert rows
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert -3 <= r.bin <= 5
        assert 0 <= r.n_agree <= r.n_docs
        assert 0 <= r.n_rule_pass <= r.n_docs
        assert 0 <= r.n_clf_keep <= r.n_docs
        assert abs(r.agree_rate - r.n_agree / r.n_docs) < 1e-5
    bins = [r.bin for r in rows]
    assert bins == sorted(bins)


def test_vad_segments_are_maximal_above_mean_runs(spark):
    from walmart_retail_pyspark_sqlite_pipeline_spark.multimodal import (
        attach_fake_payload,
        frame_energy,
    )
    from walmart_retail_pyspark_sqlite_pipeline_spark.sources import read_table

    segs = multimodal_audio_vad_segments(spark, SF_SMALL).collect()
    assert segs, "no VAD segments"
    fr = frame_energy(
        attach_fake_payload(read_table(spark, SF_SMALL, "documents"))
    ).collect()
    by_doc: dict[int, list] = {}
    for r in fr:
        by_doc.setdefault(r.doc_id, []).append(r)
    # recompute islands per doc in plain python and compare
    expected = []
    for doc_id, frames in by_doc.items():
        frames.sort(key=lambda r: r.frame_idx)
        total = sum(r.energy for r in frames)
        seg_id, prev_active = 0, False
        cur = None
        for r in frames:
            active = r.energy * r.n_frames > total
            if active and not prev_active:
                seg_id += 1
                cur = [doc_id, seg_id, r.frame_idx, r.frame_idx, 1, r.energy]
                expected.append(cur)
            elif active:
                cur[3] = r.frame_idx
                cur[4] += 1
                cur[5] += r.energy
            prev_active = active
    got = sorted(
        (r.doc_id, r.seg_id, r.start_frame, r.end_frame, r.n_frames, r.seg_energy)
        for r in segs
    )
    assert got == sorted(tuple(e) for e in expected)


def test_cms_heavy_changers_estimates_dominate_truth(spark):
    rows = sketch_cms_heavy_changers(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # CMS never underestimates a half's count
        assert r.est0 >= r.true0
        assert r.est1 >= r.true1
        assert r.change_est == r.est1 - r.est0
        assert r.change_true == r.true1 - r.true0
    # export is ordered by |estimated change| descending
    changes = [abs(r.change_est) for r in rows]
    assert changes == sorted(changes, reverse=True)


def test_dim_clip_bounds_match_exact_quantiles(spark):
    from walmart_retail_pyspark_sqlite_pipeline_spark.sources import (
        read_embeddings,
    )

    rows = {r.dim: r for r in embeddings_dim_clip_bounds(spark, SF_SMALL).collect()}
    assert rows
    vecs = [r.embedding for r in read_embeddings(spark, SF_SMALL).collect()]
    dims = len(vecs[0])
    assert set(rows) == set(range(dims))
    for d in (0, dims // 2, dims - 1):
        vals = sorted(v[d] for v in vecs)
        n = len(vals)
        lo = vals[(n + 99) // 100 - 1]
        hi = vals[(99 * n + 99) // 100 - 1]
        r = rows[d]
        assert r.n == n
        assert abs(r.p01 - round(lo, 6)) < 1e-9
        assert abs(r.p99 - round(hi, 6)) < 1e-9
        assert r.n_clipped == sum(1 for v in vals if v < lo or v > hi)
