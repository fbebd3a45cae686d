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


def _write_events(spark, sf, rows):
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    df.write.parquet(f"{sf}/events.parquet")


def test_time_decay_attribution_hand_calc(spark, tmp_path):
    """User 1: click (age 2 days), view (age 0 days), purchase $1.00.
    Weights 2^18 : 2^20 -> credit split exactly 20%/80% of 100e6 micro.
    User 3: touchless purchase $2.00 -> 'direct' gets the full 200e6."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.timeseries import (
        events_attribution_time_decay,
    )

    sf = str(tmp_path)
    rows = [
        Row(event_id=1, ts="2024-01-01 00:00:00", user_id=1,
            event_type="click", value=0.0),
        Row(event_id=2, ts="2024-01-03 00:00:00", user_id=1,
            event_type="view", value=0.0),
        Row(event_id=3, ts="2024-01-03 01:00:00", user_id=1,
            event_type="purchase", value=1.0),
        Row(event_id=4, ts="2024-01-05 00:00:00", user_id=3,
            event_type="purchase", value=2.0),
    ]
    _write_events(spark, sf, rows)
    got = {
        r.channel: r
        for r in events_attribution_time_decay(spark, sf).collect()
    }
    assert set(got) == {"click", "view", "direct"}
    # click: age (2d+1h) DIV 1d = 2 -> w=2^18; view: age 0 -> w=2^20
    w_click, w_view = 1 << 18, 1 << 20
    tot = w_click + w_view
    assert got["click"].attributed_micro == 100_000_000 * w_click // tot
    assert got["view"].attributed_micro == 100_000_000 * w_view // tot
    assert got["direct"].attributed_micro == 200_000_000
    assert (
        got["click"].n_credits,
        got["view"].n_credits,
        got["direct"].n_credits,
    ) == (1, 1, 1)


def test_time_decay_conserves_purchase_value_within_truncation(
    spark, tmp_path
):
    """Across many journeys the per-channel micros must sum to the total
    converted value minus at most one micro of DIV truncation per touch."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.timeseries import (
        events_attribution_time_decay,
    )

    sf = str(tmp_path)
    rows, eid = [], 0
    n_touch = 0
    for uid in range(20):
        base = 1704067200  # 2024-01-01
        for k in range(uid % 5):
            eid += 1
            n_touch += 1
            rows.append(
                Row(
                    event_id=eid,
                    ts=f"2024-01-0{1 + k % 5} 0{uid % 9}:00:00",
                    user_id=uid,
                    event_type=("click", "view", "signup")[k % 3],
                    value=0.0,
                )
            )
        eid += 1
        rows.append(
            Row(
                event_id=eid,
                ts="2024-01-09 00:00:00",
                user_id=uid,
                event_type="purchase",
                value=float(uid + 1),
            )
        )
    _write_events(spark, sf, rows)
    got = events_attribution_time_decay(spark, sf).collect()
    total_micro = sum(r.attributed_micro for r in got)
    want = sum((uid + 1) * 100 * 1_000_000 for uid in range(20))
    assert want - n_touch <= total_micro <= want


def test_ab_cuped_matches_python_float_reference(spark, tmp_path):
    """Planted per-user (x, y): the engine's mirrored-double outputs must
    equal the same IEEE expression tree computed in Python floats."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.timeseries import (
        events_ab_cuped,
    )

    sf = str(tmp_path)
    # span 00:00..02:00 -> cut at 01:00; pre events at 00:00, purchases
    # (the Y metric) at 02:00
    xs = {0: 1, 1: 2, 2: 3, 3: 4, 4: 2, 5: 1}
    ys = {0: 0, 1: 1, 2: 1, 3: 2, 4: 2, 5: 0}
    rows, eid = [], 0
    for uid, x in xs.items():
        for _ in range(x):
            eid += 1
            rows.append(
                Row(event_id=eid, ts="2024-01-01 00:00:00", user_id=uid,
                    event_type="view", value=0.0)
            )
        for _ in range(ys[uid]):
            eid += 1
            rows.append(
                Row(event_id=eid, ts="2024-01-01 02:00:00", user_id=uid,
                    event_type="purchase", value=1.0)
            )
    _write_events(spark, sf, rows)
    r = events_ab_cuped(spark, sf).collect()[0]
    # purchases at 02:00 are post-period rows; they do NOT count into x
    n = len(xs)
    sx = sum(xs.values())
    sy = sum(ys.values())
    sxy = sum(xs[u] * ys[u] for u in xs)
    sxx = sum(v * v for v in xs.values())
    syy = sum(v * v for v in ys.values())
    varx = float(n) * float(sxx) - float(sx) * float(sx)
    covxy = float(n) * float(sxy) - float(sx) * float(sy)
    vary = float(n) * float(syy) - float(sy) * float(sy)
    theta = covxy / varx
    a = [u for u in xs if u % 2 == 0]
    b = [u for u in xs if u % 2 == 1]
    mean_x = float(sx) / float(n)
    mean_y_a = float(sum(ys[u] for u in a)) / float(len(a))
    mean_y_b = float(sum(ys[u] for u in b)) / float(len(b))
    mean_x_a = float(sum(xs[u] for u in a)) / float(len(a))
    mean_x_b = float(sum(xs[u] for u in b)) / float(len(b))
    assert (r.n_a, r.n_b) == (len(a), len(b))
    assert r.theta == theta
    assert r.mean_y_a == mean_y_a and r.mean_y_b == mean_y_b
    assert r.diff_raw == mean_y_a - mean_y_b
    want_cuped = (mean_y_a - theta * (mean_x_a - mean_x)) - (
        mean_y_b - theta * (mean_x_b - mean_x)
    )
    assert r.diff_cuped == want_cuped
    assert r.rho2 == (covxy * covxy) / (varx * vary)


def test_ab_cuped_zero_variance_covariate_yields_null_theta(
    spark, tmp_path
):
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.timeseries import (
        events_ab_cuped,
    )

    sf = str(tmp_path)
    rows = []
    for uid in range(4):  # every user: exactly one pre event -> var(X)=0
        rows.append(
            Row(event_id=uid + 1, ts="2024-01-01 00:00:00", user_id=uid,
                event_type="view", value=0.0)
        )
    rows.append(
        Row(event_id=99, ts="2024-01-01 02:00:00", user_id=0,
            event_type="purchase", value=1.0)
    )
    _write_events(spark, sf, rows)
    r = events_ab_cuped(spark, sf).collect()[0]
    assert r.theta is None and r.diff_cuped is None and r.rho2 is None
    assert r.diff_raw is not None  # raw readout still defined


def test_cdc_chunking_is_shift_resistant(spark, tmp_path):
    """THE content-defined-chunking contract: a prefix insertion leaves
    the chunks past the edit identical, so most of the shifted copy still
    dedups chunk-for-chunk (fixed-width chunking would share nothing)."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.corpus import (
        corpus_cdc_chunk_dedup,
    )

    sf = str(tmp_path)
    words = [f"w{i * 7919 % 1000}x{i % 13}" for i in range(400)]
    base = " ".join(words)
    shifted = "inserted prefix tokens here " + base
    spark.createDataFrame(
        [
            Row(doc_id=1, text=base, lang="en", source="a", n_chars=len(base)),
            Row(doc_id=2, text=shifted, lang="en", source="b",
                n_chars=len(shifted)),
        ]
    ).write.parquet(f"{sf}/documents.parquet")
    hist = {r.n_copies: r for r in corpus_cdc_chunk_dedup(spark, sf).collect()}
    shared_toks = sum(
        r.tok_total for c, r in hist.items() if c >= 2
    )
    total_toks = sum(r.tok_total for r in hist.values())
    assert total_toks == 400 + 404
    # shared chunks cover both copies; the base doc alone is 400 tokens —
    # well over half of its content must re-sync after the edit
    assert shared_toks >= 400, (shared_toks, dict(hist))


def test_cdc_chunking_identical_docs_fully_dedup(spark, tmp_path):
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.corpus import (
        corpus_cdc_chunk_dedup,
    )

    sf = str(tmp_path)
    txt = " ".join(f"tok{i * 31 % 97}" for i in range(200))
    spark.createDataFrame(
        [
            Row(doc_id=i, text=txt, lang="en", source="s", n_chars=len(txt))
            for i in range(3)
        ]
    ).write.parquet(f"{sf}/documents.parquet")
    rows = corpus_cdc_chunk_dedup(spark, sf).collect()
    # identical docs -> every distinct chunk appears a multiple of 3
    # times (3x its within-doc repetition count; the planted text has
    # period 97, so some chunks DO repeat inside one doc)
    assert rows and all(r.n_copies % 3 == 0 for r in rows), rows
    assert sum(r.tok_total for r in rows) == 600


def _xy2d_reference(n: int, x: int, y: int) -> int:
    """Pure-Python Hilbert xy2d, n-1-x rotation variant (stays in
    [0, n) every round — the form the SQL arithmetic mirrors)."""
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x // s) % 2 else 0
        ry = 1 if (y // s) % 2 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_reference_walk_is_bijective_and_adjacent():
    """The property Z-order lacks: consecutive Hilbert keys are ALWAYS
    Manhattan-adjacent cells (no jumps), and the walk is a bijection."""
    n = 16
    cells = {_xy2d_reference(n, x, y): (x, y) for x in range(n) for y in range(n)}
    assert sorted(cells) == list(range(n * n))
    for d in range(n * n - 1):
        (x0, y0), (x1, y1) = cells[d], cells[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, (d, cells[d], cells[d + 1])


def test_hilbert_engine_key_matches_reference_walk(spark, tmp_path):
    """Planted orders covering every (price 0..15, month 1..12) cell:
    the engine's h_key must equal the reference walk cell-for-cell."""
    import datetime

    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.sketches import (
        layout_hilbert_clustering,
    )

    sf = str(tmp_path)
    rows = []
    k = 0
    for p in range(16):
        for m in range(1, 13):
            k += 1
            rows.append(
                Row(
                    o_orderkey=k,
                    o_totalprice=float(p),
                    o_orderdate=datetime.date(2024, m, 5),
                )
            )
    spark.createDataFrame(rows).write.parquet(f"{sf}/orders.parquet")
    got = layout_hilbert_clustering(spark, sf).collect()
    assert len(got) == 192  # 16 price x 12 month cells, one row each
    for r in got:
        assert r.n_rows == 1
        assert r.pb_min == r.pb_max and r.mb_min == r.mb_max
        assert r.h_key == _xy2d_reference(16, r.pb_min, r.mb_min), r


def test_ab_srm_flags_planted_mismatch(spark, tmp_path):
    """90 even users vs 10 odd users: chi2 = (40^2/50)*2 = 64 >> 3.841
    -> flagged; a balanced 10/10 split must NOT flag."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.timeseries import (
        events_ab_srm,
    )

    sf = str(tmp_path)
    rows = [
        Row(event_id=i + 1, ts="2024-01-01 00:00:00",
            user_id=2 * i if i < 90 else 2 * i + 1,
            event_type="view", value=0.0)
        for i in range(100)
    ]
    _write_events(spark, sf, rows)
    r = events_ab_srm(spark, sf).collect()[0]
    assert (r.n_a, r.n_b) == (90, 10)
    assert r.chi2 == 64.0 and bool(r.srm_flag) is True


def test_ab_srm_balanced_split_not_flagged(spark, tmp_path):
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.timeseries import (
        events_ab_srm,
    )

    sf = str(tmp_path)
    rows = [
        Row(event_id=i + 1, ts="2024-01-01 00:00:00", user_id=i,
            event_type="view", value=0.0)
        for i in range(20)
    ]
    _write_events(spark, sf, rows)
    r = events_ab_srm(spark, sf).collect()[0]
    assert (r.n_a, r.n_b) == (10, 10)
    assert r.chi2 == 0.0 and bool(r.srm_flag) is False


def test_power_mde_matches_hand_formula(spark, tmp_path):
    """20 users, 5 converters: p1=0.25, p2=0.275 -> the two-proportion
    sample-size formula evaluated in Python floats must match exactly."""
    import math

    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.timeseries import (
        events_power_mde,
    )

    sf = str(tmp_path)
    rows = [
        Row(event_id=i + 1, ts="2024-01-01 00:00:00", user_id=i,
            event_type="purchase" if i < 5 else "view", value=0.0)
        for i in range(20)
    ]
    _write_events(spark, sf, rows)
    r = events_power_mde(spark, sf).collect()[0]
    assert (r.n, r.conv) == (20, 5)
    p1 = 5.0 / 20.0
    p2 = p1 * 1.1
    want = math.ceil(
        7.84888591922985 * (p1 * (1.0 - p1) + p2 * (1.0 - p2))
        / ((p2 - p1) * (p2 - p1))
    )
    assert r.p_base == p1 and r.p_target == p2
    assert r.n_required_per_arm == want
    # sanity: a 10% relative lift on a 25% baseline needs thousands per arm
    assert 4000 < want < 6000


def test_power_mde_zero_conversions_yield_null(spark, tmp_path):
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.timeseries import (
        events_power_mde,
    )

    sf = str(tmp_path)
    rows = [
        Row(event_id=i + 1, ts="2024-01-01 00:00:00", user_id=i,
            event_type="view", value=0.0)
        for i in range(5)
    ]
    _write_events(spark, sf, rows)
    r = events_power_mde(spark, sf).collect()[0]
    assert r.conv == 0 and r.n_required_per_arm is None
    assert r.p_base == 0.0


def test_target_encoding_out_of_fold_hand_calc(spark, tmp_path):
    """Two categories, 2 folds, hand-checkable counts: the encode must
    exclude the fold's own rows and smooth toward the global rate."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.retail import (
        TE_SMOOTH_M,
        ml_target_encoding,
    )

    sf = str(tmp_path)
    rows = []
    k = 0
    # category A: fold0 4 rows 3 pos, fold1 6 rows 1 pos (via key parity
    # against TE_FOLDS=5 -> use keys 0/5 mod 5 => folds 0; build folds
    # explicitly with keys congruent to the fold index)
    def add(cat, fold, n, npos):
        nonlocal k
        for i in range(n):
            key = fold + 5 * (k + 1)
            k += 1
            rows.append(
                Row(
                    o_orderkey=key,
                    o_orderpriority=cat,
                    o_orderstatus="F" if i < npos else "O",
                )
            )

    add("A", 0, 4, 3)
    add("A", 1, 6, 1)
    add("B", 0, 5, 0)
    add("B", 1, 5, 5)
    spark.createDataFrame(rows).write.parquet(f"{sf}/orders.parquet")
    got = {
        (r.category, r.fold): r
        for r in ml_target_encoding(spark, sf).collect()
    }
    g_cnt, g_pos = 20, 9
    cells = {("A", 0): (4, 3), ("A", 1): (6, 1),
             ("B", 0): (5, 0), ("B", 1): (5, 5)}
    for (cat, fold), (cnt, pos) in cells.items():
        cat_cnt = sum(c for (c2, _), (c, _) in cells.items() if c2 == cat)
        cat_pos = sum(p for (c2, _), (_, p) in cells.items() if c2 == cat)
        oof_cnt, oof_pos = cat_cnt - cnt, cat_pos - pos
        want = (
            (oof_pos * g_cnt + TE_SMOOTH_M * g_pos) * 1_000_000
        ) // ((oof_cnt + TE_SMOOTH_M) * g_cnt)
        r = got[(cat, fold)]
        assert r.n_oof == oof_cnt
        assert r.enc_micro == want, ((cat, fold), r.enc_micro, want)
    # leakage control: A-fold0's encode uses ONLY A-fold1's rows — its
    # oof rate (1/6) sits below fold0's own rate (3/4); the smoothed
    # encode must be below the own-fold rate
    assert got[("A", 0)].enc_micro < 750_000
