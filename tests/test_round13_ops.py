"""Behavioral tests for the round-13 operators on planted data — the
oracle gate proves engine parity on the synthetic corpus; these prove the
semantics do what they claim."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tests.conftest import SF_SMALL
from walmart_retail_pyspark_sqlite_pipeline_spark.operators.ranking import (
    global_ntile,
    global_row_number,
)
from walmart_retail_pyspark_sqlite_pipeline_spark.plans.corpus import (
    corpus_ccnet_perplexity_buckets,
    text_lm_score,
)
from walmart_retail_pyspark_sqlite_pipeline_spark.plans.parity import (
    q48_global_rank,
)
from walmart_retail_pyspark_sqlite_pipeline_spark.plans.quality_suite import (
    qc_referential_integrity,
)
from walmart_retail_pyspark_sqlite_pipeline_spark.plans.timeseries import (
    events_attribution_position,
)


def test_global_row_number_matches_window(spark):
    """The distributed rank must equal the single-partition window's
    row_number on every row, for an adversarial value distribution
    (duplicates, negatives, a constant run) and a partition count that
    does not divide the row count."""
    vals = [7, -3, 7, 0, 0, 0, 42, -3, 9, 1, 1, 5, 7] * 7  # 91 rows
    df = spark.createDataFrame(
        [Row(id=i, v=v) for i, v in enumerate(vals)]
    ).repartition(8)
    got = {
        r.id: r.rn
        for r in global_row_number(
            df, [F.desc("v"), F.col("id")], out="rn"
        ).collect()
    }
    w = Window.orderBy(F.desc("v"), "id")
    want = {
        r.id: r.rn
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_ntile_matches_window_for_all_remainders(spark):
    """Exact ntile parity for every n mod buckets class, including
    n < buckets."""
    for n in (1, 2, 3, 4, 5, 7, 12, 37):
        df = spark.createDataFrame(
            [Row(id=i, v=(i * 13) % 7) for i in range(n)]
        ).crossJoin(
            spark.createDataFrame([Row(_n=n)])
        )
        got = {
            r.id: r.b
            for r in global_ntile(
                df, [F.col("v"), F.col("id")], "_n", 4, "b"
            ).collect()
        }
        w = Window.orderBy("v", "id")
        want = {
            r.id: r.b
            for r in df.withColumn("b", F.ntile(4).over(w)).collect()
        }
        assert got == want, f"ntile mismatch at n={n}"


def test_q48_rank_is_dense_and_value_ordered(spark):
    rows = q48_global_rank(spark, SF_SMALL).collect()
    ranks = sorted(r.value_rank for r in rows)
    assert ranks == list(range(1, len(rows) + 1)), "ranks not dense 1..n"
    by_rank = sorted(rows, key=lambda r: r.value_rank)
    for a, b in zip(by_rank, by_rank[1:]):
        assert (a.cents, -a.o_orderkey) >= (b.cents, -b.o_orderkey)


def test_referential_integrity_counts_planted_orphans(spark, tmp_path):
    sf = str(tmp_path)
    spark.createDataFrame(
        [Row(c_custkey=1), Row(c_custkey=2)]
    ).write.parquet(f"{sf}/customer.parquet")
    spark.createDataFrame(
        [Row(p_partkey=10)]
    ).write.parquet(f"{sf}/part.parquet")
    spark.createDataFrame(
        [Row(s_suppkey=100)]
    ).write.parquet(f"{sf}/supplier.parquet")
    # one orphan custkey=99; order 21 never referenced (not an orphan)
    spark.createDataFrame(
        [
            Row(o_orderkey=20, o_custkey=1),
            Row(o_orderkey=21, o_custkey=2),
            Row(o_orderkey=22, o_custkey=99),
        ]
    ).write.parquet(f"{sf}/orders.parquet")
    # lineitem: one bad orderkey, two bad partkeys, zero bad suppkeys
    spark.createDataFrame(
        [
            Row(l_orderkey=20, l_partkey=10, l_suppkey=100),
            Row(l_orderkey=999, l_partkey=10, l_suppkey=100),
            Row(l_orderkey=22, l_partkey=11, l_suppkey=100),
            Row(l_orderkey=20, l_partkey=12, l_suppkey=100),
        ]
    ).write.parquet(f"{sf}/lineitem.parquet")
    got = {
        r.fk_edge: (r.n_child_rows, r.n_orphans)
        for r in qc_referential_integrity(spark, sf).collect()
    }
    assert got == {
        "lineitem.l_orderkey->orders": (4, 1),
        "lineitem.l_partkey->part": (4, 2),
        "lineitem.l_suppkey->supplier": (4, 0),
        "orders.o_custkey->customer": (3, 1),
    }


def test_position_attribution_u_shape_on_planted_journeys(spark, tmp_path):
    sf = str(tmp_path)
    ts = [f"2024-01-01 00:0{i}:00" for i in range(10)]
    rows = [
        # user 1: ad -> email -> search -> purchase(100.00): 40/20/40
        Row(event_id=1, ts=ts[0], user_id=1, event_type="ad", value=0.0),
        Row(event_id=2, ts=ts[1], user_id=1, event_type="email", value=0.0),
        Row(event_id=3, ts=ts[2], user_id=1, event_type="search", value=0.0),
        Row(event_id=4, ts=ts[3], user_id=1, event_type="purchase", value=100.0),
        # user 2: bare purchase(50.00) -> direct 100%
        Row(event_id=5, ts=ts[0], user_id=2, event_type="purchase", value=50.0),
        # user 2 second journey: one touch then purchase(10.00) -> ad 100%
        Row(event_id=6, ts=ts[1], user_id=2, event_type="ad", value=0.0),
        Row(event_id=7, ts=ts[2], user_id=2, event_type="purchase", value=10.0),
        # user 3: two touches, NO purchase -> no credits at all
        Row(event_id=8, ts=ts[0], user_id=3, event_type="ad", value=0.0),
        Row(event_id=9, ts=ts[1], user_id=3, event_type="email", value=0.0),
    ]
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    df.write.parquet(f"{sf}/events.parquet")
    got = {
        r.channel: (r.n_credits, r.attributed_micro)
        for r in events_attribution_position(spark, sf).collect()
    }
    cents100, cents50, cents10 = 10_000, 5_000, 1_000
    assert got == {
        # ad: 40% of user1's purchase + 100% of user2's second journey
        "ad": (2, cents100 * 1_000_000 * 2 // 5 + cents10 * 1_000_000),
        "email": (1, cents100 * 1_000_000 // 5),
        "search": (1, cents100 * 1_000_000 * 2 // 5),
        "direct": (1, cents50 * 1_000_000),
    }


def test_ccnet_buckets_partition_each_language(spark):
    buckets = corpus_ccnet_perplexity_buckets(spark, SF_SMALL).collect()
    scored = text_lm_score(spark, SF_SMALL)
    from walmart_retail_pyspark_sqlite_pipeline_spark.sources import read_table

    langs = read_table(spark, SF_SMALL, "documents").select("doc_id", "lang")
    per_lang = {
        r.lang: r.n
        for r in scored.join(langs, "doc_id")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    by_lang: dict[str, dict[str, object]] = {}
    for r in buckets:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    for lang, bs in by_lang.items():
        assert sum(b.n_docs for b in bs.values()) == per_lang[lang]
        # tercile sizes differ by at most 1
        sizes = sorted(b.n_docs for b in bs.values())
        assert sizes[-1] - sizes[0] <= 1
        # head reads more fluent than tail, and ranges don't invert
        if "head" in bs and "tail" in bs:
            assert bs["head"].mean_nll <= bs["tail"].mean_nll
            assert bs["head"].max_nll <= bs["tail"].min_nll + 1e-9


def test_markov_attribution_on_planted_chain(spark, tmp_path):
    """Hand-solvable chain: u1 ad->purchase, u2 ad->drop, u3 email->purchase.
    Full chain: P(conv|START)=2/3. Remove ad: its journeys drop, P=1/3.
    Remove email: P=1/3. Removal effects equal -> shares 0.5/0.5."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.timeseries import (
        events_attribution_markov,
    )
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    sf = str(tmp_path)
    ts = [f"2024-01-01 00:0{i}:00" for i in range(4)]
    rows = [
        Row(event_id=1, ts=ts[0], user_id=1, event_type="ad", value=0.0),
        Row(event_id=2, ts=ts[1], user_id=1, event_type="purchase", value=1.0),
        Row(event_id=3, ts=ts[0], user_id=2, event_type="ad", value=0.0),
        Row(event_id=4, ts=ts[0], user_id=3, event_type="email", value=0.0),
        Row(event_id=5, ts=ts[1], user_id=3, event_type="purchase", value=1.0),
    ]
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    df.write.parquet(f"{sf}/events.parquet")
    got = {
        r.channel: r for r in events_attribution_markov(spark, sf).collect()
    }
    assert set(got) == {"ad", "email"}
    # START -> ad (2/3) -> CONV (1/2); START -> email (1/3) -> CONV (1)
    # p_full = 2/3*1/2 + 1/3*1 = 2/3 (micro-truncated)
    assert abs(got["ad"].p_conv_full - 2 / 3) < 2e-6
    # remove ad: START->ad edges go to DROP; only email converts: 1/3
    assert abs(got["ad"].p_conv_removed - 1 / 3) < 2e-6
    # remove email: ad journeys unaffected: 2/3 * 1/2 = 1/3
    assert abs(got["email"].p_conv_removed - 1 / 3) < 2e-6
    assert abs(got["ad"].attribution_share - 0.5) < 2e-6
    assert abs(got["email"].attribution_share - 0.5) < 2e-6


def test_pairs_scaled_equals_brute_force_within_cells(spark):
    """Every exported pair must (a) verify at cos >= threshold and (b) the
    pair set must equal brute-force enumeration WITHIN the learned fine
    cells — the candidate discipline is the cells; the verify is exact."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.llm import (
        COSINE_DUP_THRESHOLD,
        _two_level_fine_cells,
        dedup_embedding_pairs_scaled,
    )

    got = {
        (r.vec_a, r.vec_b): r.cos
        for r in dedup_embedding_pairs_scaled(spark, SF_SMALL).collect()
    }
    ev = _two_level_fine_cells(spark, SF_SMALL).collect()
    by_cell: dict[int, list] = {}
    for r in ev:
        by_cell.setdefault(r.fcell, []).append(r)

    def cos(u, v):
        num = sum(a * b for a, b in zip(u, v))
        den = (sum(a * a for a in u) ** 0.5) * (sum(b * b for b in v) ** 0.5)
        return round(num / den, 6)

    want = {}
    for members in by_cell.values():
        members = sorted(members, key=lambda r: r.vec_id)
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                c = cos(a.v, b.v)
                if c >= COSINE_DUP_THRESHOLD:
                    want[(a.vec_id, b.vec_id)] = c
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 2e-6
