"""Behavioral tests for the round-12 operators on planted data — the
oracle gate proves engine parity on the synthetic corpus; these prove the
semantics do what they claim."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from walmart_retail_pyspark_sqlite_pipeline_spark.plans.corpus import (
    corpus_lm_kneser_ney,
    corpus_tokenizer_fertility,
    text_pii_detect,
)
from walmart_retail_pyspark_sqlite_pipeline_spark.plans.llm import (
    RANGE_TAU,
    SIMHASH_HAM_MAX,
    _simhash64_index,
    ann_range_search_cosine,
    ann_topk_cosine,
    dedup_simhash_hamming_pairs,
    embeddings_whitening_stats,
)


def test_simhash_hamming_pairs_verified_distance(spark):
    """Every exported pair must be within the Hamming radius, and the
    banded recall guarantee must hold: ANY fingerprint pair within the
    radius shares a nibble band, so brute-force pairs == LSH pairs."""
    pairs = dedup_simhash_hamming_pairs(spark, SF_SMALL).collect()
    fp = {
        r.doc_id: r.simhash60
        for r in _simhash64_index(spark, SF_SMALL).collect()
    }
    got = {(r.doc_a, r.doc_b) for r in pairs}
    for r in pairs:
        assert 0 <= r.hamming <= SIMHASH_HAM_MAX
        assert bin(fp[r.doc_a] ^ fp[r.doc_b]).count("1") == r.hamming
    ids = sorted(fp)
    want = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fp[a] ^ fp[b]).count("1") <= SIMHASH_HAM_MAX
    }
    assert got == want, "pigeonhole LSH missed or invented pairs"


def test_range_search_threshold_and_consistency_with_topk(spark):
    rows = ann_range_search_cosine(spark, SF_SMALL).collect()
    assert rows, "radius search returned nothing on the synthetic corpus"
    for r in rows:
        assert r.cos >= RANGE_TAU
        assert r.vec_id != r.q_id
    # query 0's radius set must contain every exact top-k hit above tau
    top = ann_topk_cosine(spark, SF_SMALL).collect()
    radius0 = {r.vec_id for r in rows if r.q_id == 0}
    for t in top:
        if t.cos >= RANGE_TAU:
            assert t.vec_id in radius0


def test_whitening_stats_match_plain_moments(spark):
    rows = embeddings_whitening_stats(spark, SF_SMALL).collect()
    assert len(rows) == 64
    from walmart_retail_pyspark_sqlite_pipeline_spark.sources import (
        read_embeddings,
    )

    vecs = [r.embedding for r in read_embeddings(spark, SF_SMALL).collect()]
    d0 = [round(v[0] * 1e6) for v in vecs]
    n = len(d0)
    mean = sum(d0) / (n * 1e6)
    var = (n * sum(x * x for x in d0) - sum(d0) ** 2) / (n * n * 1e12)
    assert abs(rows[0].mean - mean) < 2e-6
    assert abs(rows[0].variance - var) < 2e-6
    assert all(r.n == n for r in rows)


def test_kneser_ney_prefers_predictable_text(spark):
    rows = corpus_lm_kneser_ney(spark, SF_SMALL).collect()
    assert rows, "no scored docs"
    for r in rows:
        # every bigram probability is < 1 => avg NLL strictly positive
        assert r.avg_nll_kn > 0 and math.isfinite(r.avg_nll_kn)
        assert r.n_bigrams >= 1


def test_kneser_ney_hand_computed_corpus(spark, tmp_path):
    """Hand-check the KN mixture on a 3-doc corpus small enough to do on
    paper: docs 'a b', 'a b', 'a c' => bigram counts c(a b)=2, c(a c)=1,
    c1(a)=3, N1+(a .)=2, N1+(. b)=1, N1+(. c)=1, NT=2."""
    rows = [
        Row(doc_id=0, text="a b", lang="en", source="s", n_chars=3),
        Row(doc_id=1, text="a b", lang="en", source="s", n_chars=3),
        Row(doc_id=2, text="a c", lang="en", source="s", n_chars=3),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r.doc_id: r.avg_nll_kn
        for r in corpus_lm_kneser_ney(spark, str(tmp_path)).collect()
    }
    # P(b|a) = (max(4*2-3,0)*2 + 3*2*1) / (4*3*2) = (10+6)/24 = 16/24
    # P(c|a) = (max(4*1-3,0)*2 + 3*2*1) / (4*3*2) = (2+6)/24 = 8/24
    p_b = (max(4 * 2 - 3, 0) * 2 + 3 * 2 * 1) / (4 * 3 * 2)
    p_c = (max(4 * 1 - 3, 0) * 2 + 3 * 2 * 1) / (4 * 3 * 2)
    assert abs(out[0] - (-math.floor(math.log(p_b) * 1e6 + 0.5) / 1e6)) < 2e-6
    assert abs(out[2] - (-math.floor(math.log(p_c) * 1e6 + 0.5) / 1e6)) < 2e-6
    assert out[0] < out[2], "the twice-seen bigram must score as more likely"


def test_tokenizer_fertility_totals(spark):
    rows = corpus_tokenizer_fertility(spark, SF_SMALL).collect()
    assert rows
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert r.tokens_per_doc > 0
        if r.tot_tokens > 0:
            assert r.chars_per_token > 0


def test_pii_detect_plants(spark, tmp_path):
    rows = [
        Row(doc_id=0, text="contact me at bob@example.com today",
            lang="en", source="s0", n_chars=35),
        Row(doc_id=1, text="call 5551234567 now", lang="en", source="s0",
            n_chars=19),
        Row(doc_id=2, text="account 123456789012 flagged", lang="en",
            source="s1", n_chars=28),
        Row(doc_id=3, text="clean text only words", lang="en", source="s1",
            n_chars=21),
        Row(doc_id=4, text=None, lang="en", source="s1", n_chars=None),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r.source: r for r in text_pii_detect(spark, str(tmp_path)).collect()}
    s0, s1 = out["s0"], out["s1"]
    assert s0.n_email_like == 1 and s0.n_digit7 == 1 and s0.n_digit12 == 0
    assert s0.n_docs == 2 and abs(s0.flagged_share - 1.0) < 1e-9
    # the 12-digit run also counts as a 7+ run; NULL text is clean
    assert s1.n_digit12 == 1 and s1.n_digit7 == 1 and s1.n_email_like == 0
    assert s1.n_docs == 3 and abs(s1.flagged_share - round(1 / 3, 6)) < 2e-6


def test_pii_detect_clean_synthetic_corpus(spark):
    """The driver's synthetic docs are lowercase word soup — the census
    must report them clean rather than hallucinate matches."""
    rows = text_pii_detect(spark, SF_SMALL).collect()
    assert rows
    assert all(r.n_email_like == 0 for r in rows)
    assert all(r.flagged_share == 0.0 for r in rows)


def test_attribution_last_touch_planted(spark, tmp_path):
    """Planted stream: user 1 view->click->purchase(10) credits click;
    user 2 purchase(5) with no prior touch credits direct; user 3's
    purchase(2) after a view credits view; a NULL-value purchase counts a
    row but no revenue."""
    import datetime as dt

    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.timeseries import (
        events_attribution_last_touch,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, uid, typ, val, s):
        return Row(event_id=eid, ts=t0 + dt.timedelta(seconds=s),
                   user_id=uid, event_type=typ, value=val, props="{}")

    rows = [
        ev(1, 1, "view", 0.0, 0),
        ev(2, 1, "click", 0.0, 10),
        ev(3, 1, "purchase", 10.0, 20),
        ev(4, 2, "purchase", 5.0, 5),
        ev(5, 3, "view", 0.0, 1),
        ev(6, 3, "purchase", 2.0, 9),
        ev(7, 3, "purchase", None, 12),  # still last-touched by the view
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = {
        r.channel: r
        for r in events_attribution_last_touch(spark, str(tmp_path)).collect()
    }
    assert out["click"].attributed_cents == 1000
    assert out["direct"].attributed_cents == 500
    assert out["view"].n_purchases == 2  # the NULL-value purchase counts
    assert out["view"].attributed_cents == 200
    total = 1000 + 500 + 200
    assert abs(out["click"].revenue_share - round(1000 / total, 6)) < 2e-6
