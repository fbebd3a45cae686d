"""Behavioral tests for the round-14 operators on planted data — the
oracle gate proves engine parity on the synthetic corpus; these prove the
semantics do what they claim."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tests.conftest import SF_SMALL
from walmart_retail_pyspark_sqlite_pipeline_spark.plans.corpus import (
    SHARD_DOCS,
    corpus_training_order,
)
from walmart_retail_pyspark_sqlite_pipeline_spark.plans.sketches import (
    sketch_hdr_quantiles,
)
from walmart_retail_pyspark_sqlite_pipeline_spark.plans.timeseries import (
    events_ab_test,
)


def test_training_order_is_dense_deterministic_and_sharded(spark):
    rows = corpus_training_order(spark, SF_SMALL).collect()
    n = len(rows)
    assert sorted(r.ord for r in rows) == list(range(1, n + 1)), (
        "ord must be a dense 1..n permutation"
    )
    # reproducible: a second independent invocation yields the same order
    again = {
        r.doc_id: r.ord for r in corpus_training_order(spark, SF_SMALL).collect()
    }
    assert {r.doc_id: r.ord for r in rows} == again
    # shard/pos are the fixed-size block decomposition of ord
    for r in rows:
        assert r.shard == (r.ord - 1) // SHARD_DOCS
        assert r.pos == (r.ord - 1) % SHARD_DOCS
    # and the order is actually shuffled, not doc_id order (md5 keying):
    by_ord = [r.doc_id for r in sorted(rows, key=lambda r: r.ord)]
    assert by_ord != sorted(by_ord)


def test_training_order_matches_window_row_number(spark):
    """The distributed rank must equal the naive unpartitioned
    ROW_NUMBER over the same md5 key (small data, so the banned window
    is affordable as the test oracle)."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.corpus import (
        TRAINING_ORDER_SEED,
    )

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(257)])
    keyed = docs.select(
        "doc_id",
        F.md5(
            F.concat(
                F.lit(TRAINING_ORDER_SEED + ":"), F.col("doc_id").cast("string")
            )
        ).alias("k"),
    )
    w = Window.orderBy(F.col("k").asc_nulls_first(), F.col("doc_id").asc_nulls_first())
    want = {
        r.doc_id: r.ord
        for r in keyed.withColumn("ord", F.row_number().over(w)).collect()
    }
    from walmart_retail_pyspark_sqlite_pipeline_spark.operators.ranking import (
        global_row_number,
    )

    got = {
        r.doc_id: r.ord
        for r in global_row_number(
            keyed,
            [F.col("k").asc_nulls_first(), F.col("doc_id").asc_nulls_first()],
            out="ord",
        ).collect()
    }
    assert got == want


def test_hdr_quantiles_error_contract_on_planted_values(spark, tmp_path):
    """Planted value set with hand-computable quantiles: the chosen
    bucket must CONTAIN the exact discrete quantile (that is the sketch's
    whole contract), and the midpoint's relative error is < 50%."""
    sf = str(tmp_path)
    # 100 rows: 50 x $1.00 (100 cents, bucket 7), 45 x $10.00 (1000
    # cents, bucket 10), 5 x $1000.00 (100000 cents, bucket 17)
    vals = [1.0] * 50 + [10.0] * 45 + [1000.0] * 5
    spark.createDataFrame(
        [Row(o_orderkey=i, o_totalprice=v) for i, v in enumerate(vals)]
    ).write.parquet(f"{sf}/orders.parquet")
    got = {r.q_pct: r for r in sketch_hdr_quantiles(spark, sf).collect()}
    assert set(got) == {50, 95, 99}
    exact = {50: 100, 95: 1000, 99: 100000}  # cents at ceil(p*n/100)
    for p, cents in exact.items():
        r = got[p]
        assert r.bucket_lo <= cents <= r.bucket_hi, (p, cents, r)
        assert r.est_mid == (r.bucket_lo + r.bucket_hi) // 2
        # relative error bound of the log2 bucket midpoint
        assert abs(r.est_mid - cents) <= cents, (p, r)
        assert r.total == 100
        assert r.target_rank == (p * 100 + 99) // 100
        assert r.cum_count >= r.target_rank


def test_ab_test_z_score_matches_hand_calc(spark, tmp_path):
    """8 users: arm A (even ids) 4 users 3 converted, arm B (odd ids)
    4 users 1 converted. z = (0.75-0.25)/sqrt(0.5*0.5*(1/4+1/4))."""
    sf = str(tmp_path)
    rows = []
    eid = 0
    for uid in range(8):
        eid += 1
        rows.append(
            Row(
                event_id=eid,
                ts="2024-01-01 00:00:00",
                user_id=uid,
                event_type="view",
                value=0.0,
            )
        )
    for uid in (0, 2, 4, 1):  # 3 even converters + 1 odd
        eid += 1
        rows.append(
            Row(
                event_id=eid,
                ts="2024-01-01 00:01:00",
                user_id=uid,
                event_type="purchase",
                value=1.0,
            )
        )
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.parquet(f"{sf}/events.parquet")
    r = events_ab_test(spark, sf).collect()[0]
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (4, 3, 4, 1)
    want_z = (0.75 - 0.25) / math.sqrt(0.5 * 0.5 * (1 / 4 + 1 / 4))
    assert abs(r.z_score - want_z) < 1e-12
    assert abs(r.p_a - 0.75) < 1e-12 and abs(r.p_b - 0.25) < 1e-12


def test_ab_test_degenerate_arms_yield_null_z(spark, tmp_path):
    """One-arm data (all even user ids): z must be NULL, counts exact."""
    sf = str(tmp_path)
    rows = [
        Row(
            event_id=i,
            ts="2024-01-01 00:00:00",
            user_id=2 * i,
            event_type="view",
            value=0.0,
        )
        for i in range(1, 4)
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.parquet(f"{sf}/events.parquet")
    r = events_ab_test(spark, sf).collect()[0]
    assert (r.n_a, r.n_b) == (3, 0)
    assert r.z_score is None and r.p_b is None


def test_ann_eval_mrr_contract_on_sf_small(spark):
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.llm import (
        ANN_K,
        KNN_Q,
        ann_eval_mrr,
    )

    rows = ann_eval_mrr(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= KNN_Q
    tot = sum(r.rr_micro for r in rows)
    for r in rows:
        if r.approx_rank is None:
            assert r.rr_micro == 0
        else:
            assert 1 <= r.approx_rank <= ANN_K
            assert r.rr_micro == 1_000_000 // r.approx_rank
        assert r.mrr_micro == tot // len(rows)


def test_ann_eval_mrr_single_cell_is_perfect(spark, tmp_path):
    """With one label (one IVF cell) the single-probe search IS the exact
    search, so every query's exact top-1 must sit at approx rank 1."""
    import random

    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.llm import (
        ann_eval_mrr,
    )

    rng = random.Random(7)
    sf = str(tmp_path)
    rows = [
        Row(
            vec_id=i,
            embedding=[rng.uniform(-1, 1) for _ in range(64)],
            label=1,
        )
        for i in range(40)
    ]
    spark.createDataFrame(rows).selectExpr(
        "vec_id",
        "CAST(embedding AS ARRAY<FLOAT>) AS embedding",
        "CAST(label AS INT) AS label",
    ).write.parquet(f"{sf}/embeddings.parquet")
    got = ann_eval_mrr(spark, sf).collect()
    assert len(got) == 5
    for r in got:
        assert r.approx_rank == 1 and r.rr_micro == 1_000_000
        assert r.mrr_micro == 1_000_000
