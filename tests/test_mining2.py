"""Round-5 additions: bigram LM, trailing z-score, triangles, source cap."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_bigram_logprob_hand_computed(spark):
    from vector_mcp_spark.operators.lm import bigram_interpolated_logprob

    docs = spark.createDataFrame(
        [(0, "aa bb aa bb"), (1, "aa bb"), (2, "zz")], "doc_id int, text string"
    )
    out = {r.doc_id: r for r in bigram_interpolated_logprob(docs, lam=0.5).collect()}
    # corpus: uni aa=3 bb=3 zz=1, N=7; bigrams: (aa,bb)=3 (bb,aa)=1
    p_ab = 0.5 * 3 / 3 + 0.5 * 3 / 7
    p_ba = 0.5 * 1 / 3 + 0.5 * 3 / 7
    assert out[0].n_bigrams == 3
    assert out[0].avg_logprob == pytest.approx(
        round((2 * math.log(p_ab) + math.log(p_ba)) / 3, 4)
    )
    assert out[1].n_bigrams == 1
    assert out[1].avg_logprob == pytest.approx(round(math.log(p_ab), 4))
    assert 2 not in out  # single-token doc has no bigrams


def test_bigram_logprob_lam_bounds(spark):
    from vector_mcp_spark.operators.lm import bigram_interpolated_logprob

    docs = spark.createDataFrame([(0, "a b")], "doc_id int, text string")
    with pytest.raises(ValueError):
        bigram_interpolated_logprob(docs, lam=1.0)


def test_trailing_zscore_flags_spike(spark):
    from vector_mcp_spark.operators.anomaly import trailing_zscore

    rows = []
    eid = 0
    # 10 quiet days of 5 events, then a 50-event spike on day 11
    for day in range(1, 11):
        for _ in range(5 if day <= 10 else 0):
            rows.append((eid, f"2024-03-{day:02d} 12:00:00", "click"))
            eid += 1
    for _ in range(50):
        rows.append((eid, "2024-03-11 12:00:00", "click"))
        eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts string, event_type string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {r.day.day: r for r in trailing_zscore(ev, "event_type", "ts").collect()}
    # constant history -> sigma 0 -> no z, never flagged
    assert out[10].z is None and out[10].is_anomaly is False
    assert out[11].is_anomaly is False or out[11].z is None  # sigma of constant window = 0
    # early days lack min_prior history
    assert out[1].mu is None and out[2].mu is None and out[3].mu is None


def test_trailing_zscore_nonconstant_history(spark):
    from vector_mcp_spark.operators.anomaly import trailing_zscore

    counts = {1: 4, 2: 6, 3: 5, 4: 5, 5: 6, 6: 4, 7: 5, 8: 40}
    rows = []
    eid = 0
    for day, n in counts.items():
        for _ in range(n):
            rows.append((eid, f"2024-03-{day:02d} 12:00:00", "click"))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts string, event_type string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {r.day.day: r for r in trailing_zscore(ev, "event_type", "ts").collect()}
    hist = [4, 6, 5, 5, 6, 4, 5]
    mu = sum(hist) / 7
    sig = math.sqrt(sum((x - mu) ** 2 for x in hist) / 7)
    assert out[8].mu == pytest.approx(round(mu, 6))
    assert out[8].sigma == pytest.approx(round(sig, 6))
    assert out[8].z == pytest.approx(round((40 - mu) / sig, 4))
    assert out[8].is_anomaly is True


def test_triangle_count_known_graph(spark):
    from vector_mcp_spark.operators.graph import triangle_count

    # K4 has 4 triangles; plus a pendant edge
    edges = [(a, b) for a in range(4) for b in range(4) if a < b] + [(3, 9)]
    e = spark.createDataFrame(edges, "a int, b int")
    r = triangle_count(e).collect()[0]
    assert (r.n_edges, r.n_triangles) == (7, 4)


def test_undirected_edges_canonical(spark):
    from vector_mcp_spark.operators.graph import undirected_edges

    m = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 10), (2, 20), (2, 10)], "grp int, item int"
    )
    got = {(r.a, r.b) for r in undirected_edges(m).collect()}
    assert got == {(10, 20)}


def test_per_group_cap(spark):
    from vector_mcp_spark.operators.packing import per_group_cap

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 2)) for i in range(30)], "doc_id int, source string"
    )
    out = per_group_cap(df, "source", "doc_id", 5)
    by_grp = out.groupBy("source").count().collect()
    assert all(r["count"] == 5 for r in by_grp)
    # deterministic across invocations
    a = sorted((r.doc_id, r.rk) for r in out.collect())
    b = sorted((r.doc_id, r.rk) for r in per_group_cap(df, "source", "doc_id", 5).collect())
    assert a == b
    with pytest.raises(ValueError):
        per_group_cap(df, "source", "doc_id", 0)


def test_winsorize_hand_case(spark):
    from vector_mcp_spark.operators.robust import winsorize_stats

    vals = list(range(1, 11)) + [1000]  # one wild outlier
    df = spark.createDataFrame([("g", float(v)) for v in vals], "grp string, value double")
    r = winsorize_stats(df, "grp", "value", lo=0.0, hi=0.90).collect()[0]
    # p90 of 11 sorted values (type-7): idx 0.9*10 = 9.0 -> exactly 10.0
    assert r.p_hi == 10.0 and r.p_lo == 1.0
    assert r.n_clipped_hi == 1 and r.n_clipped_lo == 0
    assert r.mean_winsorized == pytest.approx(round((sum(range(1, 11)) + 10) / 11, 6))
    with pytest.raises(ValueError):
        winsorize_stats(df, "grp", "value", lo=0.5, hi=0.5)


def test_chi2_independent_and_dependent(spark):
    from vector_mcp_spark.operators.assoc import crosstab_chi2

    # perfectly independent 2x2: chi2 = 0
    rows = [("en", "s1")] * 10 + [("en", "s2")] * 10 + [("de", "s1")] * 10 + [("de", "s2")] * 10
    df = spark.createDataFrame(rows, "lang string, source string")
    r = crosstab_chi2(df, "lang", "source").collect()[0]
    assert (r.n, r.r, r.c, r.dof) == (40, 2, 2, 1)
    assert r.chi2 == 0.0 and r.cramers_v == 0.0
    # perfectly dependent 2x2: chi2 = n, cramers_v = 1
    rows = [("en", "s1")] * 10 + [("de", "s2")] * 10
    r = crosstab_chi2(
        spark.createDataFrame(rows, "lang string, source string"), "lang", "source"
    ).collect()[0]
    assert r.chi2 == pytest.approx(20.0)
    assert r.cramers_v == pytest.approx(1.0)


def test_pmi_prefers_exclusive_pairs(spark):
    from vector_mcp_spark.operators.assoc import collocation_pmi

    # "zig zag" always adjacent and exclusive; "the cat" frequent but 'the' everywhere
    text = " ".join(["zig zag"] * 5 + ["the cat"] * 5 + ["the dog"] * 5 + ["the end"] * 5)
    docs = spark.createDataFrame([(0, text)], "doc_id int, text string")
    out = collocation_pmi(docs, min_count=5, k=3).collect()
    assert (out[0].w1, out[0].w2) == ("zig", "zag")
    assert out[0].pmi > out[-1].pmi
    with pytest.raises(ValueError):
        collocation_pmi(docs, min_count=0)


def test_markov_transitions_hand_case(spark):
    from vector_mcp_spark.operators.sequence import markov_transitions

    rows = [
        (1, 1, "2024-01-01 00:00:00", "a"),
        (2, 1, "2024-01-01 00:01:00", "b"),
        (3, 1, "2024-01-01 00:02:00", "a"),
        (4, 1, "2024-01-01 00:03:00", "c"),
        (5, 2, "2024-01-01 00:00:00", "a"),
        (6, 2, "2024-01-01 00:01:00", "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id int, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {(r.src, r.dst): (r.n, r.p) for r in markov_transitions(ev).collect()}
    # from 'a': ->b twice, ->c once; from 'b': ->a once
    assert got[("a", "b")] == (2, round(2 / 3, 6))
    assert got[("a", "c")] == (1, round(1 / 3, 6))
    assert got[("b", "a")] == (1, 1.0)
    # no cross-user transition (user 2 ends at 'b'; user 1's 'b'->'a' is the only one)
    assert ("c", "a") not in got


def test_heldout_ppl_oov_and_ordering(spark):
    from vector_mcp_spark.operators.lm import bigram_heldout_logprob

    train = spark.createDataFrame(
        [(0, "the cat sat on the mat " * 5)], "doc_id int, text string"
    )
    ev = spark.createDataFrame(
        [(100, "the cat sat"), (101, "qq zz xx")], "doc_id int, text string"
    )
    out = {r.doc_id: r for r in bigram_heldout_logprob(train, ev).collect()}
    # in-domain text scores far better than pure-OOV gibberish
    assert out[100].avg_logprob > out[101].avg_logprob
    assert out[100].ppl < out[101].ppl
    assert out[101].n_bigrams == 2
    import math

    # pure-OOV bigram prob = 0.3 * 1/(N+V+1) exactly
    n, v = 30, 5  # 30 train tokens; vocab {the, cat, sat, on, mat}
    want = math.log(0.3 * 1.0 / (n + v + 1))
    assert out[101].avg_logprob == pytest.approx(round(want, 4))


def test_label_propagation_two_cliques(spark):
    from vector_mcp_spark.operators.graph import label_propagation

    # two triangles bridged by one edge: LPA should find two communities
    tri1 = [(1, 2), (1, 3), (2, 3)]
    tri2 = [(10, 11), (10, 12), (11, 12)]
    e = spark.createDataFrame(tri1 + tri2 + [(3, 10)], "a int, b int")
    labels = {r.node: r.label for r in label_propagation(e, iters=4).collect()}
    assert labels[1] == labels[2] == labels[3]
    assert labels[10] == labels[11] == labels[12]
    assert labels[1] != labels[10]
    from vector_mcp_spark.operators.graph import label_propagation as lp

    with pytest.raises(ValueError):
        lp(e, iters=0)


def test_cusum_finds_level_shift(spark):
    from vector_mcp_spark.operators.anomaly import cusum_changepoint

    # level shift after day 10: 5/day then 15/day
    rows = []
    eid = 0
    for day in range(1, 21):
        for _ in range(5 if day <= 10 else 15):
            rows.append((eid, f"2024-03-{day:02d} 12:00:00", "click"))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts string, event_type string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    r = cusum_changepoint(ev, "event_type", "ts").collect()[0]
    assert r.n_days == 20 and r.mean_cnt == 10.0
    # |S| peaks exactly at the last pre-shift day (day 10): |10*(5-10)| = 50
    assert r.cp_day.day == 10 and r.max_abs_cusum == 50.0


def test_theil_sen_ignores_outlier_day(spark):
    from vector_mcp_spark.operators.robust import theil_sen_trend

    # perfect slope 2/day with one wild outlier day
    counts = {d: 2 * d for d in range(1, 11)}
    counts[5] = 500
    rows = []
    eid = 0
    for day, n in counts.items():
        for _ in range(n):
            rows.append((eid, f"2024-03-{day:02d} 12:00:00", "click"))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts string, event_type string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    r = theil_sen_trend(ev, "event_type", "ts").collect()[0]
    assert r.slope == pytest.approx(2.0, abs=0.2)  # OLS here would be ~ -8


def test_seasonal_decomposition_identity_and_pattern(spark):
    from vector_mcp_spark.operators.anomaly import seasonal_decomposition

    # pure weekly pattern over 4 weeks: weekday counts 10, weekend 30
    import datetime

    rows = []
    eid = 0
    d0 = datetime.date(2024, 3, 4)  # a Monday
    for i in range(28):
        day = d0 + datetime.timedelta(days=i)
        n = 30 if day.weekday() >= 5 else 10
        for _ in range(n):
            rows.append((eid, f"{day} 12:00:00", "click"))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts string, event_type string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = seasonal_decomposition(ev, "event_type", "ts").collect()
    assert len(out) == 28
    for r in out:
        # additive identity holds to rounding (seasonal/residual at 4 dp)
        assert abs(r.cnt - (r.trend + r.seasonal + r.residual)) < 2e-4
    # weekend seasonal component is clearly positive, midweek negative
    by_dow = {}
    for r in out:
        by_dow.setdefault(r.day.weekday(), []).append(r.seasonal)
    assert min(by_dow[5]) > 0 and min(by_dow[6]) > 0
    assert max(by_dow[1]) < 0


def test_nearest_centroid_separable_labels(spark):
    from vector_mcp_spark.operators.centroids import nearest_centroid_confusion

    # two cleanly separated label clusters -> perfect diagonal
    rows = []
    for i in range(20):
        rows.append((i, 0, [10.0 + (i % 3) * 0.1, 0.0, 0.0]))
        rows.append((100 + i, 1, [0.0, 10.0 + (i % 3) * 0.1, 0.0]))
    df = spark.createDataFrame(rows, "vec_id int, label int, embedding array<double>")
    out = {(r.true_label, r.pred_label): r.n for r in nearest_centroid_confusion(df).collect()}
    assert out == {(0, 0): 20, (1, 1): 20}


def test_doc_keywords_idf_zero_for_ubiquitous_terms(spark):
    from vector_mcp_spark.suite import SUITE

    import os

    # exercised via the suite fn on the real fixture: a term present in
    # every doc has idf ln(1) = 0 and cannot outrank any rarer term
    fn = SUITE["corpus_doc_keywords"].spark_fn
    out = fn(spark, os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"))
    assert out.where("score < 0").count() == 0
    per_doc = out.groupBy("doc_id").count().agg(F.max("count").alias("m")).collect()[0].m
    assert per_doc <= 5


def test_chi2_null_category_counts(spark):
    from vector_mcp_spark.operators.assoc import crosstab_chi2

    # NULL is a real level: perfectly dependent once NULL rows are matched
    rows = [("en", "s1")] * 10 + [(None, "s2")] * 10
    r = crosstab_chi2(
        spark.createDataFrame(rows, "lang string, source string"), "lang", "source"
    ).collect()[0]
    assert (r.n, r.r, r.c) == (20, 2, 2)
    assert r.chi2 == pytest.approx(20.0)  # NULL cell observed, not zeroed
    assert r.cramers_v == pytest.approx(1.0)


def test_bigram_ops_survive_empty_docs(spark):
    from vector_mcp_spark.operators.assoc import collocation_pmi
    from vector_mcp_spark.operators.lm import bigram_heldout_logprob, bigram_interpolated_logprob

    docs = spark.createDataFrame(
        [(0, "aa bb aa bb cc"), (1, ""), (2, "! 1 ?"), (3, "solo")],
        "doc_id int, text string",
    )
    got = {r.doc_id for r in bigram_interpolated_logprob(docs).collect()}
    assert got == {0}
    assert collocation_pmi(docs, min_count=2, k=5).count() >= 1
    ho = bigram_heldout_logprob(docs, docs)
    assert {r.doc_id for r in ho.collect()} == {0}


def test_sorted_neighborhood_finds_near_dups(spark):
    from vector_mcp_spark.operators.dedup import sorted_neighborhood_pairs

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),     # near-dup of 1, same prefix
        (3, "completely different words here"),
        (4, "alpha beta gamma delta epsilon"),  # exact dup of 1
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = {(r.id_a, r.id_b): r.jaccard for r in
           sorted_neighborhood_pairs(docs, window=3, threshold=0.5,
                                     id_col="doc_id", content_col="text").collect()}
    assert got[(1, 4)] == 1.0
    assert got[(1, 2)] == pytest.approx(round(4 / 6, 6))
    assert not any(3 in p for p in got)
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(docs, window=0)


def test_prefix_sort_key_orders_like_strings(spark):
    from vector_mcp_spark.operators.dedup import _prefix_sort_key

    words = ["", "a", "ab", "ab1", "abc", "b", "z9", "zzzzzzzzzzzzzz"]
    df = spark.createDataFrame([(i, w) for i, w in enumerate(words)], "i int, t string")
    out = df.select("t", _prefix_sort_key("t").alias("k")).collect()
    ks = {r.t: r.k for r in out}
    # '0'-padded base-36 ordering == string ordering for [a-z0-9] prefixes
    padded = sorted(words, key=lambda w: (w[:12] + "0" * 12)[:12])
    assert sorted(words, key=lambda w: ks[w]) == padded


def test_skyline_hand_case_and_duplicates(spark):
    from vector_mcp_spark.operators.skyline import skyline

    pts = [
        (1, 5.0, 1.0),
        (2, 4.0, 4.0),
        (3, 1.0, 5.0),
        (4, 3.0, 3.0),   # dominated by 2
        (5, 5.0, 1.0),   # duplicate of 1: both survive
        (6, 5.0, 0.5),   # dominated by 1 (same x, lower y)
        (7, 4.0, 4.0),   # duplicate of 2
    ]
    df = spark.createDataFrame(pts, "id int, a double, b double").repartition(3)
    got = {r.id for r in skyline(df, ["a", "b"], "id").collect()}
    assert got == {1, 2, 3, 5, 7}
    import pytest as _pt

    with _pt.raises(ValueError):
        skyline(df, [], "id")


def test_skyline_2d_matches_nd(spark):
    import random

    from vector_mcp_spark.operators.skyline import _skyline_mask_2d, _skyline_mask_nd
    import numpy as np

    rng = random.Random(11)
    vals = np.array([[rng.randint(0, 20) / 2, rng.randint(0, 20) / 2] for _ in range(300)])
    assert sorted(_skyline_mask_2d(vals)) == sorted(_skyline_mask_nd(vals))


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from vector_mcp_spark.operators.bootstrap import bootstrap_mean_ci

    rows = [(i, "g", float(100 + (i % 21) - 10)) for i in range(400)]
    df = spark.createDataFrame(rows, "event_id long, grp string, value double").withColumn(
        "_row_id", F.col("event_id")
    )
    r1 = bootstrap_mean_ci(df, "grp", "value", replicates=30).collect()[0]
    r2 = bootstrap_mean_ci(df, "grp", "value", replicates=30).collect()[0]
    assert (r1.ci_lo, r1.ci_hi) == (r2.ci_lo, r2.ci_hi)  # hash draws: deterministic
    assert r1.ci_lo <= r1.mean <= r1.ci_hi
    # CI width ~ 2*1.65*sd/sqrt(n) with sd~6.06, n=400 -> ~1.0; sanity band
    assert 0.2 < (r1.ci_hi - r1.ci_lo) < 3.0
    import pytest as _pt

    with _pt.raises(ValueError):
        bootstrap_mean_ci(df, "grp", "value", replicates=1)
    with _pt.raises(ValueError):
        bootstrap_mean_ci(df.drop("_row_id"), "grp", "value")


def test_poisson1_multiplicities_distribution(spark):
    from vector_mcp_spark.operators.bootstrap import POISSON1_CDF, _poisson1, _u01

    df = spark.createDataFrame([(i,) for i in range(5000)], "i long")
    ks = df.select(_poisson1(_u01(["i"], "t")).alias("k")).groupBy("k").count().collect()
    freq = {r.k: r["count"] / 5000 for r in ks}
    import math

    assert freq[0] == pytest.approx(math.exp(-1), abs=0.03)
    assert freq[1] == pytest.approx(math.exp(-1), abs=0.03)
    assert freq.get(2, 0) == pytest.approx(math.exp(-1) / 2, abs=0.02)
    assert POISSON1_CDF[0] == pytest.approx(math.exp(-1), abs=1e-9)


def test_strip_repeated_spans_first_copy_survives(spark):
    """C4 cut semantics: the FIRST doc containing a span keeps it; later
    docs lose exactly the covered tokens; a span repeated WITHIN one doc
    (but novel corpus-wide) is never stripped."""
    from vector_mcp_spark.operators.novelty import strip_repeated_spans

    df = spark.createDataFrame(
        [
            ("d1", "alpha beta gamma delta epsilon zeta"),
            ("d2", "prefix alpha beta gamma delta epsilon suffix"),
            # d3 repeats ITS OWN 5-gram twice — first_seen is d3, kept whole
            ("d3", "one two three four five one two three four five"),
        ],
        "doc_id string, text string",
    )
    out = {r.id: r for r in strip_repeated_spans(df, n=5).collect()}
    assert out["d1"].n_removed == 0
    assert out["d2"].n_removed == 5 and out["d2"].clean_text == "prefix suffix"
    assert out["d3"].n_removed == 0 and out["d3"].n_tokens == 10


def test_strip_repeated_spans_short_docs_pass_through(spark):
    from vector_mcp_spark.operators.novelty import strip_repeated_spans

    df = spark.createDataFrame(
        [("d1", "too short"), ("d2", "too short")],  # < n tokens: no spans
        "doc_id string, text string",
    )
    out = {r.id: r for r in strip_repeated_spans(df, n=5).collect()}
    assert out["d1"].n_removed == 0 and out["d2"].n_removed == 0
    assert out["d2"].clean_text == "too short"


def test_log_histogram_quantiles_accuracy_and_merge(spark):
    """Sketch quantiles must land within one bin's relative width (~19% at
    4 sub-bins) of the exact quantile, and merging two shard sketches must
    equal the sketch of the union (the mergeability contract)."""
    from pyspark.sql import functions as F

    from vector_mcp_spark.operators.sketches import histogram_quantiles, log_histogram
    from vector_mcp_spark.suite import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    hist = log_histogram(ev, "value", ["event_type"])
    got = {
        (r.event_type, r.p): r.q_est
        for r in histogram_quantiles(hist, ["event_type"], [0.5, 0.99]).collect()
    }
    exact = {
        (r.event_type, p): r[f"q{int(p * 100)}"]
        for r in ev.groupBy("event_type").agg(
            F.expr("percentile(value, 0.5)").alias("q50"),
            F.expr("percentile(value, 0.99)").alias("q99"),
        ).collect()
        for p in (0.5, 0.99)
    }
    # p50 sits in dense bins (≈ one 19%-bin of error); p99 lands in sparse
    # tail bins where the ceil-rank (type-1) vs percentile()'s interpolated
    # order stat can differ by a bin — allow two bins of relative slop there
    for (etype, p), est in got.items():
        tol = 0.20 if p == 0.5 else 0.40
        assert abs(est - exact[(etype, p)]) / max(exact[(etype, p)], 1e-9) < tol, (
            etype, p, est, exact[(etype, p)])

    # mergeability: sum of shard histograms == histogram of the union
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    merged = (
        log_histogram(a, "value", ["event_type"])
        .unionByName(log_histogram(b, "value", ["event_type"]))
        .groupBy("event_type", "bin_id")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = log_histogram(ev, "value", ["event_type"])
    diff = merged.exceptAll(whole).count() + whole.exceptAll(merged).count()
    assert diff == 0


def test_bfs_levels_edge_cases(spark):
    from vector_mcp_spark.operators.graph import bfs_levels

    # path graph 1-2-3-4-5 plus disconnected 8-9; hop cap 2 from node 1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)], "a long, b long"
    )
    got = {r.node: r.level for r in bfs_levels(edges, 1, max_hops=2).collect()}
    assert got == {1: 0, 2: 1, 3: 2}
    # isolated seed still reports itself at level 0
    got = {r.node: r.level for r in bfs_levels(edges, 42, max_hops=3).collect()}
    assert got == {42: 0}
    # early exit on exhausted component: full reach, no phantom levels
    got = {r.node: r.level for r in bfs_levels(edges, 8, max_hops=10).collect()}
    assert got == {8: 0, 9: 1}
    # cycle: levels are shortest-path hops, no infinite expansion
    tri = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "a long, b long")
    got = {r.node: r.level for r in bfs_levels(tri, 1, max_hops=5).collect()}
    assert got == {1: 0, 2: 1, 3: 1}


def test_personalized_pagerank_mass_concentrates_on_seed_side(spark):
    from vector_mcp_spark.operators.graph import personalized_pagerank

    # barbell: 1-2-3 chain and 10-11 far away (disconnected)
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 1, 1.0), (2, 3, 1.0), (3, 2, 1.0),
         (10, 11, 1.0), (11, 10, 1.0)],
        "src long, dst long, w double",
    )
    pr = {r.node: r.pr for r in personalized_pagerank(edges, [1], iters=4).collect()}
    # all mass stays in the seed's component; seed outranks the far chain end
    assert pr[10] == 0.0 and pr[11] == 0.0
    assert pr[1] > pr[3] > 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        personalized_pagerank(edges, [])


def test_ks_two_sample_empty_slice_fails_loudly(spark):
    """ADVICE r9: an empty slice has no CDF — ks_two_sample must raise
    instead of returning ks_d = NaN (a silent "no drift")."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from vector_mcp_spark.operators.drift import ks_two_sample

    df = spark.createDataFrame([(1.0, "a"), (2.0, "a")], "v double, g string")
    with _pytest.raises(ValueError, match="non-empty"):
        ks_two_sample(df, "v", F.col("g") == "a", F.col("g") == "b")
