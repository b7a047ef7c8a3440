from __future__ import annotations

import hashlib

import pytest

from vector_mcp_spark.operators.textstats import text_stats

DOCS = [
    (1, "the cat and the dog are in the house"),
    (2, "der hund und die katze sind nicht da"),
    (3, ""),
    (4, "x1 y2 z3 999 !!!"),
]


@pytest.fixture(scope="module")
def stats(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, content string")
    return {r.doc_id: r for r in text_stats(df, id_col="doc_id").collect()}


def test_token_counts(stats):
    assert stats[1].n_tokens == 9
    assert stats[3].n_tokens == 0


def test_stopword_ratio(stats):
    # tokens: the cat and the dog are in the house → stops: the,and,the,in,the = 5/9
    assert stats[1].stop_ratio == round(5 / 9, 6)
    assert stats[3].stop_ratio == 0.0


def test_lang_id(stats):
    assert stats[1].lang_pred == "en"
    assert stats[2].lang_pred == "de"
    assert stats[3].lang_pred == "und"
    assert stats[4].lang_pred == "und"  # no marker tokens


def test_quality_bounds(stats):
    for r in stats.values():
        assert 0.0 <= r.quality <= 1.0
    assert stats[1].quality > stats[4].quality


def test_fingerprint_is_sorted_distinct_md5(stats):
    toks = sorted(set("the cat and the dog are in the house".split()))
    expect = hashlib.md5(" ".join(toks).encode()).hexdigest()
    assert stats[1].fingerprint == expect
    assert stats[3].fingerprint == hashlib.md5(b"").hexdigest()


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta beta")], "doc_id int, content string"
    )
    rows = {r.doc_id: r.fingerprint for r in text_stats(df, id_col="doc_id").collect()}
    assert rows[1] == rows[2]


# -- KMV distinct sketch ------------------------------------------------------


def test_kmv_exact_below_k_and_estimates_above(spark):
    from vector_mcp_spark.operators.sketches import kmv_distinct

    rows = [("small", f"u{i}") for i in range(10)]
    rows += [("big", f"v{i}") for i in range(2000)]
    df = spark.createDataFrame(rows, "grp string, user string")
    got = {r.grp: (r.n_kept, r.est_distinct) for r in
           kmv_distinct(df, ["grp"], "user", k=64).collect()}
    # under k distinct → exact
    assert got["small"] == (10, 10)
    # over k → estimate within 25% of truth at k=64 (KMV RSE ≈ 1/sqrt(k-2) ≈ 13%)
    n_kept, est = got["big"]
    assert n_kept == 64 and abs(est - 2000) / 2000 < 0.25


def test_kmv_merge_is_lossless(spark):
    """Merging per-part sketches must equal the sketch computed directly on
    the union — the property that lets daily sketches answer all-time
    distinct questions without re-scanning raw data."""
    from vector_mcp_spark.operators.sketches import kmv_estimate, kmv_merge, kmv_sketch

    rows = [("g", i % 7, f"u{i}") for i in range(500)]
    rows += [("h", i % 3, f"u{i}") for i in range(40)]  # under k → exact path
    df = spark.createDataFrame(rows, "grp string, part int, user string")

    merged = kmv_merge(kmv_sketch(df, ["grp", "part"], "user", k=64), ["grp"], k=64)
    direct = kmv_sketch(df, ["grp"], "user", k=64)
    m = {r.grp: r.ks for r in merged.collect()}
    d = {r.grp: r.ks for r in direct.collect()}
    assert m == d  # bit-identical sketches, not just close estimates

    est = {
        r.grp: r.est
        for r in merged.select("grp", kmv_estimate(k=64).alias("est")).collect()
    }
    assert est["h"] == 40  # < k distinct → exact
    assert abs(est["g"] - 500) / 500 < 0.25


def test_kmv_estimate_matches_kmv_distinct(spark):
    from vector_mcp_spark.operators.sketches import kmv_distinct, kmv_estimate, kmv_sketch

    rows = [("a", f"x{i}") for i in range(300)] + [("b", f"y{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "grp string, user string")
    via_sketch = {
        r.grp: r.est
        for r in kmv_sketch(df, ["grp"], "user", k=64)
        .select("grp", kmv_estimate(k=64).alias("est"))
        .collect()
    }
    via_distinct = {
        r.grp: r.est_distinct for r in kmv_distinct(df, ["grp"], "user", k=64).collect()
    }
    assert via_sketch == via_distinct


def test_kmv_rejects_tiny_k(spark):
    import pytest as _pytest

    from vector_mcp_spark.operators.sketches import kmv_distinct

    df = spark.createDataFrame([("a", "x")], "grp string, user string")
    with _pytest.raises(ValueError):
        kmv_distinct(df, ["grp"], "user", k=1)


# -- column profiling ---------------------------------------------------------


def test_profile_columns_hand_case(spark):
    from vector_mcp_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, None), (3.0, 30.0)], "a double, b double"
    )
    got = {r.col_name: r for r in profile_columns(df, ["a", "b"]).collect()}
    assert got["a"].n_rows == 3 and got["a"].n_nulls == 0
    assert (got["a"].min_val, got["a"].max_val, got["a"].sum_val) == (1.0, 3.0, 6.0)
    assert got["a"].mean_val == 2.0
    assert got["b"].n_nulls == 1 and got["b"].sum_val == 40.0 and got["b"].mean_val == 20.0


def test_profile_columns_rejects_empty(spark):
    import pytest as _pytest

    from vector_mcp_spark.operators.profile import profile_columns

    df = spark.createDataFrame([(1.0,)], "a double")
    with _pytest.raises(ValueError):
        profile_columns(df, [])


# -- count-min sketch ---------------------------------------------------------


def test_cms_never_underestimates_and_is_tight_for_heavy_hitters(spark):
    from vector_mcp_spark.operators.sketches import cms_build, cms_estimate

    rows = [("heavy",)] * 500 + [(f"light{i}",) for i in range(50)]
    df = spark.createDataFrame(rows, "v string")
    sk = cms_build(df, "v", depth=4, width=64)
    items = df.distinct()
    est = {r.v: r.est_count for r in cms_estimate(sk, items, "v", depth=4, width=64).collect()}
    truth = {"heavy": 500, **{f"light{i}": 1 for i in range(50)}}
    for v, t in truth.items():
        assert est[v] >= t  # CMS overestimates only
    # heavy hitter estimate is tight: collisions add at most the light mass
    assert est["heavy"] <= 500 + 50


def test_cms_counters_conserve_mass(spark):
    from pyspark.sql import functions as F

    from vector_mcp_spark.operators.sketches import cms_build

    df = spark.createDataFrame([(f"u{i % 7}",) for i in range(100)], "v string")
    sk = cms_build(df, "v", depth=3, width=32)
    per_row = {r.row: r.total for r in sk.groupBy("row").agg(F.sum("cnt").alias("total")).collect()}
    assert per_row == {0: 100, 1: 100, 2: 100}


def test_cms_rejects_bad_params(spark):
    import pytest as _pytest

    from vector_mcp_spark.operators.sketches import cms_build

    df = spark.createDataFrame([("a",)], "v string")
    with _pytest.raises(ValueError):
        cms_build(df, "v", depth=0)
    with _pytest.raises(ValueError):
        cms_build(df, "v", width=1)


# -- KMV row sample -----------------------------------------------------------


def test_kmv_row_sample_is_mergeable(spark):
    """k-min of the union == k-min of per-shard k-mins — per-shard samples
    roll up losslessly."""
    from vector_mcp_spark.operators.sketches import kmv_row_sample

    df = spark.createDataFrame([(i, i % 5) for i in range(1000)], "id long, shard int")
    whole = sorted(r.id for r in kmv_row_sample(df, "id", k=32).collect())
    shards = [
        kmv_row_sample(df.where(df.shard == s), "id", k=32) for s in range(5)
    ]
    pooled = shards[0]
    for s in shards[1:]:
        pooled = pooled.unionByName(s)
    merged = sorted(r.id for r in kmv_row_sample(pooled, "id", k=32).collect())
    assert whole == merged


def test_kmv_row_sample_quantile_accuracy(spark):
    from pyspark.sql import functions as F

    from vector_mcp_spark.operators.sketches import kmv_row_sample

    df = spark.createDataFrame([(i, float(i)) for i in range(10000)], "id long, v double")
    est = kmv_row_sample(df, "id", k=400).agg(
        F.percentile("v", F.lit(0.5)).alias("p50")
    ).first().p50
    # uniform 0..9999 → true median 4999.5; rank error ~ 1/sqrt(400) = 5%
    assert abs(est - 4999.5) / 10000 < 0.12


def test_kmv_row_sample_rejects_bad_k(spark):
    import pytest as _pytest

    from vector_mcp_spark.operators.sketches import kmv_row_sample

    df = spark.createDataFrame([(1,)], "id long")
    with _pytest.raises(ValueError):
        kmv_row_sample(df, "id", k=0)


# -- Gopher-style repetition signals ----------------------------------------

REP_DOCS = [
    # lines (trimmed, non-empty): "dup dup"×2, "one", "dup two" → 4 lines,
    # 3 distinct → dup_line_frac (4-3)/4; line chars 7+7+3+7=24, chars in
    # duplicated lines 14 → dup_line_char_frac 14/24. Tokens:
    # dup,dup,dup,dup,one,dup,two → 7, 3 distinct → dup_token_frac 4/7;
    # bigrams (6): "dup dup"×3, "dup one", "one dup", "dup two" → top 3/6
    (1, "dup dup\ndup dup\n  one  \ndup two"),
    (2, "alpha beta gamma"),  # no repetition at all
    (3, ""),  # empty: every frac 0, keep=True
    (4, "go go go go go go"),  # one line, all same token/bigram
]


@pytest.fixture(scope="module")
def rep(spark):
    from vector_mcp_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(REP_DOCS, "doc_id int, content string")
    return {r.doc_id: r for r in repetition_stats(df, id_col="doc_id").collect()}


def test_repetition_line_metrics(rep):
    assert rep[1].n_lines == 4
    assert rep[1].dup_line_frac == 0.25
    assert rep[1].dup_line_char_frac == round(14 / 24, 6)
    assert rep[2].n_lines == 1
    assert rep[2].dup_line_frac == 0.0
    assert rep[3].n_lines == 0 and rep[3].dup_line_frac == 0.0


def test_repetition_token_metrics(rep):
    assert rep[1].dup_token_frac == round(4 / 7, 6)
    assert rep[1].top_bigram_frac == 0.5
    assert rep[2].dup_token_frac == 0.0
    assert rep[2].top_bigram_frac == round(1 / 2, 6)
    assert rep[4].dup_token_frac == round(5 / 6, 6)
    assert rep[4].top_bigram_frac == 1.0


def test_repetition_keep_flag(rep):
    # doc1 trips top_bigram_frac (0.5 > 0.08); doc4 trips everything
    assert not rep[1].keep
    assert not rep[4].keep
    assert rep[3].keep  # empty doc passes every threshold


def test_expectation_report_counts_each_violation_kind(spark):
    from vector_mcp_spark.operators.expectations import expectation_report

    df = spark.createDataFrame(
        [
            (1, "ok", 5),
            (1, "ok", 5),        # duplicate id
            (2, None, 5),        # null text
            (3, "bad-lang", -1), # out-of-range value
        ],
        "id long, text string, v long",
    )
    rows = {
        r.rule: (r.violations, r.passed)
        for r in expectation_report(
            df,
            [
                ("not_null", "text"),
                ("range", "v", 0, 10),
                ("unique", "id"),
                ("expr", "v_lt_100", "v < 100"),
            ],
        ).collect()
    }
    assert rows["not_null:text"] == (1, False)
    assert rows["range:v"] == (1, False)
    assert rows["unique:id"] == (1, False)
    assert rows["expr:v_lt_100"] == (0, True)


def test_group_robust_outliers_hand_case(spark):
    from vector_mcp_spark.operators.robust import group_robust_outliers

    rows = [("a", i, float(v)) for i, v in enumerate([1, 2, 3, 4, 100])] + [
        ("b", 10, 5.0),
        ("b", 11, 5.0),
    ]
    df = spark.createDataFrame(rows, "grp string, id long, value double")
    got = {(r.grp, r.id): r for r in group_robust_outliers(df, "grp", "id", "value").collect()}
    # group a: median 3, MAD = median(|v-3|) = median([2,1,0,1,97]) = 1
    assert got[("a", 0)].med == 3.0 and got[("a", 0)].mad == 1.0
    assert got[("a", 4)].is_outlier  # |100-3| > 3*1
    assert not got[("a", 0)].is_outlier  # |1-3| = 2 <= 3
    # group b: constant values → MAD 0, nothing flagged (0 > 0 false)
    assert not got[("b", 10)].is_outlier and got[("b", 10)].mad == 0.0


def test_expectation_ref_rule_counts_orphans(spark):
    from vector_mcp_spark.operators.expectations import expectation_report

    df = spark.createDataFrame([(1,), (2,), (9,)], "k long")
    dim = spark.createDataFrame([(1,), (2,)], "pk long")
    rows = {
        r.rule: (r.violations, r.passed)
        for r in expectation_report(df, [("ref", "k", dim, "pk")]).collect()
    }
    assert rows["ref:k"] == (1, False)  # 9 has no parent


def test_expectation_report_empty_rules_raises(spark):
    from vector_mcp_spark.operators.expectations import expectation_report

    df = spark.createDataFrame([(1,)], "x long")
    import pytest

    with pytest.raises(ValueError, match="no rules"):
        expectation_report(df, [])


def test_nb_classifier_separates_obvious_classes(spark):
    """operators/textclf.py: NB over hashed buckets must classify clearly
    separable vocabularies correctly, deterministically, with scores from
    the documented smoothed formula."""
    from pyspark.sql import functions as F

    from vector_mcp_spark.operators.textclf import nb_classify, nb_train

    rows = []
    for i in range(30):
        rows.append((i * 2, "spark shuffle partition executor " * 4, 0))
        rows.append((i * 2 + 1, "sonnet stanza rhyme meter poem " * 4, 1))
    df = spark.createDataFrame(rows, "id long, text string, label int")
    train = df.where(F.col("id") >= 10)
    test = df.where(F.col("id") < 10)
    counts, classes = nb_train(train, text_col="text", label_col="label")
    pred = nb_classify(test, counts, classes, text_col="text", id_col="id")
    got = {r.id: r.predicted for r in pred.collect()}
    assert got == {i: i % 2 for i in range(10)}
    # deterministic: a re-run scores identically
    again = {r.id: (r.predicted, r.score)
             for r in nb_classify(test, counts, classes, text_col="text", id_col="id").collect()}
    assert {k: v[0] for k, v in again.items()} == got
    # weight table is vocabulary-bounded (the broadcastability claim)
    assert counts.count() <= 1024 * 2
