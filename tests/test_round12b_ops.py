"""Round-12 second-wave operators.

Covers: hard-mined contrastive triplets (margin semantics, argmax
determinism), majority-label-prop communities (planted-block recovery,
positive modularity, NOT the connected-components collapse).
"""

from __future__ import annotations

import pytest

from airbnb_listings_reviews_data_engineering_spark.plans import all_queries

SF001 = "/root/testdata/sf0.01"


# --- contrastive triplets ------------------------------------------------------


def test_triplets_one_per_anchor_and_margin(spark):
    q = all_queries()["sample_contrastive_triplets"].fn
    rows = q(spark, SF001).collect()
    # one triplet per anchor (every anchor has both a same-label and a
    # cross-label candidate in the 500-vector corpus)
    anchors = [r.anchor_id for r in rows]
    assert len(anchors) == len(set(anchors)) == 64
    for r in rows:
        # margin is exactly the rounded difference, and ids are distinct
        assert r.margin == pytest.approx(round(r.cos_pos - r.cos_neg, 4), abs=1e-9)
        assert r.pos_id != r.anchor_id and r.neg_id != r.anchor_id
        assert r.pos_id != r.neg_id


def test_triplets_positive_is_same_label_negative_is_not(spark):
    from pyspark.sql import functions as F

    from airbnb_listings_reviews_data_engineering_spark.plans.registry import load

    q = all_queries()["sample_contrastive_triplets"].fn
    out = q(spark, SF001)
    lab = load(spark, SF001, "embeddings").select("vec_id", "label")
    j = (
        out.join(lab.withColumnRenamed("vec_id", "anchor_id"), "anchor_id")
        .withColumnRenamed("label", "a_lab")
        .join(
            lab.select(
                F.col("vec_id").alias("pos_id"), F.col("label").alias("p_lab")
            ),
            "pos_id",
        )
        .join(
            lab.select(
                F.col("vec_id").alias("neg_id"), F.col("label").alias("n_lab")
            ),
            "neg_id",
        )
    )
    bad = j.filter(
        (F.col("a_lab") != F.col("p_lab")) | (F.col("a_lab") == F.col("n_lab"))
    ).count()
    assert bad == 0


def test_triplets_hardest_negative_is_argmax(spark):
    """The emitted negative must dominate every other cross-label
    candidate's cosine for that anchor (verified brute force for 3
    anchors)."""
    from pyspark.sql import functions as F

    from airbnb_listings_reviews_data_engineering_spark.functions.arrays import (
        as_double_array,
        cosine,
    )
    from airbnb_listings_reviews_data_engineering_spark.plans.registry import load

    q = all_queries()["sample_contrastive_triplets"].fn
    picked = {r.anchor_id: r for r in q(spark, SF001).collect()}
    e = load(spark, SF001, "embeddings").select(
        "vec_id", "label", F.slice(as_double_array("embedding"), 1, 8).alias("v")
    )
    anchors = {r.vec_id: r for r in e.filter(F.col("vec_id") < 3).collect()}
    for aid, arow in anchors.items():
        cands = (
            e.filter(
                (F.col("label") != arow.label) & (F.col("vec_id") != aid)
            )
            .select(
                "vec_id",
                F.round(cosine(F.lit(arow.v).cast("array<double>"), F.col("v")), 4).alias(
                    "c"
                ),
            )
            .collect()
        )
        best = max(cands, key=lambda r: (r.c, -r.vec_id))
        assert picked[aid].cos_neg == pytest.approx(best.c, abs=1e-9)


# --- label-prop communities ----------------------------------------------------


def test_labelprop_recovers_planted_blocks(spark):
    """Every detected community lives inside ONE planted 15-node block
    (majority updates never let a single cross-block chord flip a
    node), and total modularity is strongly positive."""
    q = all_queries()["graph_label_prop_communities"].fn
    rows = q(spark, SF001).collect()
    assert len(rows) == 16
    assert sum(r.n_nodes for r in rows) == 120
    q_total = sum(r.modularity_part for r in rows)
    assert q_total > 0.7
    # communities are block-pure: a community's nodes span one block,
    # so its seed label's block == every member's block; the label
    # itself is the min member, and sizes are the 10/5 split of each
    # 15-block (coarse 5-seeds meeting min-tie flow)
    sizes = sorted(r.n_nodes for r in rows)
    assert sizes == [5] * 8 + [10] * 8
    for r in rows:
        assert r.community % 5 == 0


def test_labelprop_is_not_connected_components(spark):
    """The planted graph is (nearly) one connected component thanks to
    the cross-block chords — min-label CC would collapse it into a
    handful of giant labels. 16 stable communities proves the majority
    rule actually defended block boundaries."""
    q = all_queries()["graph_label_prop_communities"].fn
    rows = q(spark, SF001).collect()
    comms = {r.community for r in rows}
    # CC collapse would leave far fewer labels than planted blocks
    assert len(comms) == 16
    # internal edges dominate: the partition is denser than chance
    internal = sum(r.n_internal for r in rows)
    assert internal > 0


# --- AdaBoost stumps -----------------------------------------------------------


def test_adaboost_rounds_are_weak_learners(spark):
    q = all_queries()["ml_adaboost_stumps"].fn
    rows = {r.round_id: r for r in q(spark, SF001).collect()}
    assert set(rows) == {1, 2, 3, 99}
    for t in (1, 2, 3):
        # every chosen stump must beat chance on the weighted sample
        assert rows[t].err_rate < 0.5
        assert rows[t].alpha > 0
    # reweighting must move the search: round 2 picks a DIFFERENT stump
    # than round 1 (same stump twice means the weight update is a no-op)
    assert (rows[1].feature, rows[1].split_bin) != (
        rows[2].feature,
        rows[2].split_bin,
    )
    # the ensemble is at least as good as the first (best single) stump
    assert rows[99].err_rate <= rows[1].err_rate + 1e-9


def test_adaboost_round1_weights_are_uniform_stump(spark):
    """Round 1 runs on uniform weights, so its stump must equal the
    plain unweighted best stump over the same features."""
    from pyspark.sql import functions as F

    from airbnb_listings_reviews_data_engineering_spark.plans.registry import load

    q = all_queries()["ml_adaboost_stumps"].fn
    r1 = [r for r in q(spark, SF001).collect() if r.round_id == 1][0]
    o = load(spark, SF001, "orders").select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(-1).alias("y"),
        F.least(F.floor(F.col("o_totalprice") / 7812.5), F.lit(63))
        .cast("int")
        .alias("price_bin"),
        (F.month("o_orderdate") - 1).cast("int").alias("month_bin"),
    ).collect()
    import itertools

    best = None
    for feat in ("price", "month"):
        bins = sorted({getattr(r, f"{feat}_bin") for r in o})
        for b, pol in itertools.product(bins[:-1], (1, -1)):
            err = sum(
                1
                for r in o
                if (pol if getattr(r, f"{feat}_bin") > b else -pol) != r.y
            )
            key = (err, feat, b, -pol)
            if best is None or key < best:
                best = key
                bestrow = (feat, b, pol, err / len(o))
    assert (r1.feature, r1.split_bin) == (bestrow[0], bestrow[1])
    assert r1.err_rate == pytest.approx(bestrow[3], abs=1e-4)


# --- training-mixture composite -------------------------------------------------


def test_training_mixture_budget_and_packing(spark):
    """Emitted token total lands within one md5-gate standard deviation
    of the 2x budget, every non-terminal sequence fills >= 2048 tokens
    once its boundary doc lands, and domains mix inside sequences."""
    q = all_queries()["pipeline_training_mixture"].fn
    rows = sorted(q(spark, SF001).collect(), key=lambda r: r.seq_id)
    import duckdb

    corpus_tokens = duckdb.sql(
        "SELECT sum(len(string_split(text, ' '))) FROM "
        f"read_parquet('{SF001}/documents.parquet')"
    ).fetchone()[0]
    emitted = sum(r.sum_tokens for r in rows)
    assert abs(emitted - 2 * corpus_tokens) < 0.1 * corpus_tokens
    # seq ids are dense 0..N
    assert [r.seq_id for r in rows] == list(range(len(rows)))
    # every sequence except the last spans its full budget: the doc that
    # closes sequence s STARTS in s, so cumulative tokens through s's
    # items reach past the boundary
    for r in rows[:-1]:
        assert r.sum_tokens >= 1  # non-empty
    cum = 0
    for r in rows[:-1]:
        cum += r.sum_tokens
        assert cum >= (r.seq_id + 1) * 2048
    # the shuffle interleaves domains: a multi-item sequence should
    # usually hold more than one domain
    multi = [r for r in rows if r.n_items >= 5]
    assert multi and all(r.n_domains >= 2 for r in multi)


def test_training_mixture_repeats_docs(spark):
    """A 2x token budget forces repeats: total emitted items must
    exceed distinct docs emitted."""
    q = all_queries()["pipeline_training_mixture"].fn
    rows = q(spark, SF001).collect()
    n_items = sum(r.n_items for r in rows)
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF001}/documents.parquet')"
    ).fetchone()[0]
    assert n_items > n_docs


# --- influence proxy -----------------------------------------------------------


def test_influence_directions_and_signs(spark):
    q = all_queries()["sample_influence_proxy"].fn
    rows = q(spark, SF001).collect()
    helpful = [r for r in rows if r.direction == "helpful"]
    harmful = [r for r in rows if r.direction == "harmful"]
    assert len(helpful) == 20 and len(harmful) == 20
    # gradient alignment actually separates: every helpful score must
    # strictly dominate every harmful score
    assert min(r.influence for r in helpful) > max(
        r.influence for r in harmful
    )
    # the two slices never overlap
    assert not ({r.o_orderkey for r in helpful} & {r.o_orderkey for r in harmful})


def test_influence_is_grad_dot_grad(spark):
    """Recompute one helpful row's influence from first principles:
    (p_i - y_i) * (g_hold . [1, x1, x2])."""
    from pyspark.sql import functions as F

    from airbnb_listings_reviews_data_engineering_spark.plans.iterative_ext import (
        _INF_HOLD_GRAD,
        _INF_ROUNDS,
        _LOGREG_FEATS,
        _LOGREG_GRAD,
        _LOGREG_P,
        _LOGREG_Z,
        _logreg_update,
    )
    from airbnb_listings_reviews_data_engineering_spark.plans.registry import load

    q = all_queries()["sample_influence_proxy"].fn
    some = [r for r in q(spark, SF001).collect() if r.direction == "helpful"][0]

    f = (
        load(spark, SF001, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("x1n"),
            F.round(F.sum("l_quantity")).cast("bigint").alias("x2n"),
        )
    )
    o = load(spark, SF001, "orders")
    feats = f.join(o, f.l_orderkey == o.o_orderkey).selectExpr(
        "o_orderkey AS okey",
        "CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END AS hold",
        *_LOGREG_FEATS,
    )
    train = feats.filter(F.col("hold") == 0)
    w = spark.range(1).selectExpr(
        "CAST(0.0 AS DOUBLE) AS w0",
        "CAST(0.0 AS DOUBLE) AS w1",
        "CAST(0.0 AS DOUBLE) AS w2",
    )
    for _ in range(_INF_ROUNDS):
        scored = (
            train.crossJoin(F.broadcast(w))
            .selectExpr("y", "x1", "x2", "w0", "w1", "w2", f"{_LOGREG_Z} AS z")
            .selectExpr("y", "x1", "x2", "w0", "w1", "w2", f"{_LOGREG_P} AS p")
        )
        g = scored.agg(
            F.expr("min(w0) AS w0p"),
            F.expr("min(w1) AS w1p"),
            F.expr("min(w2) AS w2p"),
            F.expr("count(*) AS n"),
            *[F.expr(e) for e in _LOGREG_GRAD],
        )
        w = g.selectExpr(_logreg_update(0), _logreg_update(1), _logreg_update(2))
    wv = w.collect()[0]
    gh = (
        feats.filter(F.col("hold") == 1)
        .crossJoin(F.broadcast(w))
        .selectExpr("y", "x1", "x2", "w0", "w1", "w2", f"{_LOGREG_Z} AS z")
        .selectExpr("y", "x1", "x2", f"{_LOGREG_P} AS p")
        .agg(*[F.expr(e) for e in _INF_HOLD_GRAD])
        .collect()[0]
    )
    row = feats.filter(F.col("okey") == some.o_orderkey).collect()[0]
    z = wv.w0 + wv.w1 * row.x1 + wv.w2 * row.x2
    p = 0.5 + z / (2.0 * (1.0 + abs(z)))
    expect = (p - row.y) * (
        gh.h0 / 1e6 + row.x1 * gh.h1 / 1e6 + row.x2 * gh.h2 / 1e6
    )
    assert some.influence == pytest.approx(round(expect, 6), abs=2e-6)


# --- semantic chunking ----------------------------------------------------------


def test_semantic_chunking_partitions_documents(spark):
    """Chunks tile each document exactly: token totals per doc equal
    the doc's token count, chunk ids are dense from 0, and boundaries
    actually fire (more chunks than docs, fewer than windows)."""
    import duckdb

    q = all_queries()["text_semantic_chunking"].fn
    rows = q(spark, SF001).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    con = duckdb.connect()
    doc_tok = dict(
        con.execute(
            "SELECT doc_id, len(string_split(text, ' ')) FROM "
            f"read_parquet('{SF001}/documents.parquet')"
        ).fetchall()
    )
    assert set(per_doc) == set(doc_tok)
    n_windows = 0
    for d, chunks in per_doc.items():
        assert sum(c.n_tokens for c in chunks) == doc_tok[d]
        ids = sorted(c.chunk_id for c in chunks)
        assert ids == list(range(len(ids)))
        n_windows += sum(c.n_windows for c in chunks)
    assert len(doc_tok) < len(rows) < n_windows


def test_semantic_chunking_internal_joints_are_cohesive(spark):
    """Every multi-window chunk's weakest internal joint must sit at or
    above the cut threshold (that is what NOT cutting means), and
    single-window chunks carry NULL."""
    q = all_queries()["text_semantic_chunking"].fn
    for r in q(spark, SF001).collect():
        if r.n_windows == 1:
            assert r.min_internal_jac is None
        else:
            assert r.min_internal_jac >= 0.18


# --- Pareto skyline -------------------------------------------------------------


def test_skyline_is_mutually_non_dominating_and_complete(spark):
    """No front point dominates another, and every non-front doc is
    dominated by some front point (checked against a brute-force
    skyline over the scored corpus)."""
    import duckdb

    q = all_queries()["sample_pareto_skyline"].fn
    front = [(r.ttr, r.mean_tok_len) for r in q(spark, SF001).collect()]
    for a in front:
        for b in front:
            if a != b:
                assert not (a[0] >= b[0] and a[1] >= b[1])
    con = duckdb.connect()
    pts = con.execute(
        "SELECT round(len(list_distinct(string_split(text,' ')))"
        " / CAST(len(string_split(text,' ')) AS DOUBLE), 3),"
        " round((length(text) - len(string_split(text,' ')) + 1)"
        " / CAST(len(string_split(text,' ')) AS DOUBLE), 3)"
        f" FROM read_parquet('{SF001}/documents.parquet')"
    ).fetchall()
    brute = {
        p
        for p in pts
        if not any(
            (q2[0] >= p[0] and q2[1] >= p[1] and q2 != p) for q2 in pts
        )
    }
    assert set(front) == brute


# --- Kneser-Ney LM scoring -------------------------------------------------------


def test_kneser_ney_matches_reference_computation(spark):
    """Recompute one document's KN logprob with a plain-Python bigram
    model over the whole corpus and compare."""
    import math

    import duckdb

    q = all_queries()["text_kneser_ney_logprob"].fn
    got = {r.doc_id: r for r in q(spark, SF001).collect()}
    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet('{SF001}/documents.parquet')"
        ).fetchall()
    )
    from collections import Counter, defaultdict

    big = Counter()
    for t in texts.values():
        w = t.split(" ")
        for i in range(len(w) - 1):
            big[(w[i], w[i + 1])] += 1
    cw = Counter()
    n1f = Counter()
    n1p = Counter()
    for (w1, w2), c in big.items():
        cw[w1] += c
        n1f[w1] += 1
        n1p[w2] += 1
    n1all = len(big)
    D = 0.75
    for doc_id in list(texts)[:5]:
        w = texts[doc_id].split(" ")
        qsum = 0
        n = 0
        for i in range(len(w) - 1):
            p = (big[(w[i], w[i + 1])] - D) / cw[w[i]] + (
                (D * n1f[w[i]]) / cw[w[i]]
            ) * (n1p[w[i + 1]] / n1all)
            v = math.log(p) * 1e6
            # SQL round is half-AWAY-from-zero; Python round is banker's
            qsum += int(math.copysign(math.floor(abs(v) + 0.5), v))
            n += 1
        assert got[doc_id].n_bigrams == n
        raw = qsum / (1e6 * n)
        # final 6-dp round is also half-away-from-zero in both engines
        expect = math.copysign(math.floor(abs(raw) * 1e6 + 0.5), raw) / 1e6
        assert got[doc_id].kn_logprob == pytest.approx(expect, abs=1e-9)
    # KN logprobs are proper log-probabilities
    assert all(r.kn_logprob < 0 for r in got.values())


# --- BLEU-2 ----------------------------------------------------------------------


def test_bleu_identical_pair_is_one_and_bounds_hold(spark):
    """A doc paired with itself would score 1.0; here we verify the
    emitted pairs' invariants and recompute one pair by hand."""
    import math

    import duckdb

    q = all_queries()["eval_bleu_corpus"].fn
    rows = q(spark, SF001).collect()
    assert len(rows) == 250
    for r in rows:
        assert 0.0 <= r.p1 <= 1.0 and 0.0 <= r.p2 <= 1.0
        assert 0.0 < r.brevity_penalty <= 1.0
        assert 0.0 <= r.bleu2 <= 1.0
        # bleu can never exceed the brevity-penalized best precision
        assert r.bleu2 <= r.brevity_penalty + 1e-9
    texts = dict(
        duckdb.sql(
            "SELECT doc_id, text FROM "
            f"read_parquet('{SF001}/documents.parquet') WHERE doc_id < 500"
        ).fetchall()
    )
    from collections import Counter

    got = {r.cand_id: r for r in rows}
    for pid in (0, 7, 33):
        c = texts[pid].split(" ")
        rf = texts[pid + 250].split(" ")
        ps = []
        for n in (1, 2):
            cg = Counter(tuple(c[i : i + n]) for i in range(len(c) - n + 1))
            rg = Counter(tuple(rf[i : i + n]) for i in range(len(rf) - n + 1))
            clip = sum(min(v, rg[k]) for k, v in cg.items())
            ps.append(clip / sum(cg.values()))
        bp = math.exp(min(0.0, 1.0 - len(rf) / len(c)))
        bleu = (
            0.0
            if 0.0 in ps
            else bp * math.exp((math.log(ps[0]) + math.log(ps[1])) / 2.0)
        )
        assert got[pid].bleu2 == pytest.approx(round(bleu, 4), abs=2e-4)


# --- LSH S-curve -----------------------------------------------------------------


def test_s_curve_shape_and_operating_point(spark):
    q = all_queries()["dedup_lsh_s_curve"].fn
    rows = q(spark, SF001).collect()
    assert len(rows) == 6 * 19
    by_cfg = {}
    for r in rows:
        by_cfg.setdefault((r.bands, r.rows_per_band), []).append(r)
    for (b, rr), pts in by_cfg.items():
        pts.sort(key=lambda r: r.s)
        # monotone non-decreasing in s, pinned endpoints
        for a, c in zip(pts, pts[1:]):
            assert c.p_candidate >= a.p_candidate
        assert pts[0].p_candidate < 0.2 and pts[-1].p_candidate > 0.8
        # s_star is where the curve crosses ~ half; analytic check
        assert pts[0].s_star == pytest.approx((1 / b) ** (1 / rr), abs=1e-4)
    # the engine's own operating point encodes the 0.5 threshold
    op = by_cfg[(4, 2)]
    assert op[0].s_star == pytest.approx(0.5, abs=1e-4)


# --- partition-order determinism --------------------------------------------------


def _rows_canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize(
    "key",
    [
        "ml_adaboost_stumps",
        "pipeline_training_mixture",
        "text_kneser_ney_logprob",
        "sample_influence_proxy",
    ],
)
def test_round12b_partition_order_independent(key, spark):
    """The int64-quantization determinism claim, exercised: output must
    be BITWISE identical (repr-level, so sub-rounding drift in any
    double fails) under a different shuffle-partition count. These four
    keys all fold distributed float-derived state (boosting weights,
    packing cumsums, micro-nat log-sums, gradient dots) where a naive
    float sum would drift with combine order."""
    from airbnb_listings_reviews_data_engineering_spark.checkpoint import (
        release_pins,
    )

    q = all_queries()[key].fn
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    a = _rows_canon(q(spark, SF001))
    release_pins(spark)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        b = _rows_canon(q(spark, SF001))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        release_pins(spark)
    assert a == b


# --- temporal embargo split --------------------------------------------------------


def test_temporal_embargo_partitions_time(spark):
    import datetime

    import duckdb

    q = all_queries()["split_temporal_embargo"].fn
    rows = {r.split: r for r in q(spark, SF001).collect()}
    assert set(rows) == {"train", "embargo", "test", "train_test_customer_overlap"}
    mx = duckdb.sql(
        f"SELECT max(o_orderdate) FROM read_parquet('{SF001}/orders.parquet')"
    ).fetchone()[0]
    test_start = (mx - datetime.timedelta(days=180)).date()
    emb_start = (mx - datetime.timedelta(days=240)).date()
    # date extents respect the boundaries and the embargo gap is empty
    # of both train and test rows
    assert rows["test"].min_date >= str(test_start)
    assert rows["embargo"].max_date < str(test_start)
    assert rows["embargo"].min_date >= str(emb_start)
    assert rows["train"].max_date < str(emb_start)
    n_orders = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF001}/orders.parquet')"
    ).fetchone()[0]
    assert (
        rows["train"].n_rows + rows["embargo"].n_rows + rows["test"].n_rows
        == n_orders
    )
    # the overlap statistic is honest: time splits share customers
    assert 0 < rows["train_test_customer_overlap"].n_rows <= rows["test"].n_customers


# --- XML source ---------------------------------------------------------------------


def test_src_xml_roundtrip_is_real_xml_and_typed(spark):
    """The schema-first read must preserve the numeric types exactly,
    the writer must emit genuine XML row elements (not a parquet in
    disguise), and the operator must clean up its staged dir after
    materializing (ADVICE r12 — staged fixture dirs don't outlive the
    call)."""
    import glob
    import os

    from airbnb_listings_reviews_data_engineering_spark.plans.registry import load
    from airbnb_listings_reviews_data_engineering_spark.sources.staging import (
        staging_root,
    )

    q = all_queries()["src_xml"].fn
    df = q(spark, SF001)
    assert df.schema["s_acctbal"].dataType.typeName() == "double"
    assert df.schema["s_suppkey"].dataType.typeName() in ("long", "integer")
    rows = {r.s_suppkey: r for r in df.collect()}
    assert len(rows) == 100
    # the operator deletes its staged dir once the parse is pinned
    assert not glob.glob(
        os.path.join(staging_root(spark), "supplier_xml_*sf0p01*")
    )
    # the same writer the operator uses emits genuine XML row elements
    probe = os.path.join(staging_root(spark), "xml_body_probe")
    (
        load(spark, SF001, "supplier")
        .filter("s_suppkey < 5")
        .select("s_suppkey", "s_acctbal")
        .write.format("xml")
        .option("rootTag", "suppliers")
        .option("rowTag", "supplier")
        .mode("overwrite")
        .save(probe)
    )
    try:
        staged = glob.glob(os.path.join(probe, "*.xml")) or glob.glob(
            os.path.join(probe, "part-*")
        )
        assert staged
        body = open(staged[0]).read()
        assert "<supplier>" in body and "<s_acctbal>" in body
    finally:
        import shutil

        shutil.rmtree(probe, ignore_errors=True)


# --- Python data source -----------------------------------------------------------


def test_python_datasource_partitions_contract(spark):
    """The custom source must declare its own partitioning: 8 reader
    tasks, together covering exactly ids 0..999 with the engine hash."""
    q = all_queries()["src_python_datasource"].fn
    df = q(spark, SF001)
    assert df.rdd.getNumPartitions() == 8
    rows = df.collect()
    assert sorted(r.id for r in rows) == list(range(1000))
    import hashlib

    for r in rows[:20]:
        h = int(hashlib.md5(f"pyds:{r.id}".encode()).hexdigest()[:15], 16)
        assert r.h == h and r.bucket == h % 10


def test_stream_python_datasource_pages_land_exactly_once(spark):
    """Three checkpointed drains land the three pages exactly once
    (offset contract), and a fourth invocation appends nothing."""
    q = all_queries()["stream_python_datasource"].fn
    rows = {r.page: r for r in q(spark, SF001).collect()}
    assert set(rows) == {0, 1, 2}
    for p, r in rows.items():
        assert r.n_rows == 100
        assert (r.min_id, r.max_id) == (p * 100, p * 100 + 99)
        assert 0 <= r.sum_bucket <= 900
    again = {r.page: r for r in q(spark, SF001).collect()}
    assert {p: (r.n_rows, r.sum_bucket) for p, r in again.items()} == {
        p: (r.n_rows, r.sum_bucket) for p, r in rows.items()
    }
