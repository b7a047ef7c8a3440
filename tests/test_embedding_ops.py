"""Random projection and centroid-outlier operators."""

import math

import pytest

from pyspark.sql import functions as F


def test_projection_matrix_is_deterministic():
    from vector_mcp_spark.operators.projection import projection_matrix

    a = projection_matrix(8, 4)
    b = projection_matrix(8, 4)
    assert a == b
    assert projection_matrix(8, 4, seed="other") != a
    assert all(-0.5 <= x < 0.5 for row in a for x in row)


def test_project_embeddings_matches_manual_dot(spark):
    from vector_mcp_spark.operators.projection import (
        project_embeddings,
        projection_matrix,
        projection_scale,
    )

    vec = [1.0, 0.0, -2.0, 0.5]
    mat = projection_matrix(4, 2)
    df = spark.createDataFrame([(1, vec)], "vec_id int, embedding array<float>")
    got = project_embeddings(df, mat).first().proj
    for j in range(2):
        want = sum(v * m for v, m in zip(vec, mat[j])) * projection_scale(2)
        assert got[j] == pytest.approx(want, abs=1e-9)


def test_projection_distances_concentrate_near_original(spark):
    """JL property at 64→16 with norm-preserving scaling: squared pairwise
    distances land near their original values (RSE ≈ sqrt(2/16) ≈ 35%, so
    the gate is loose but would catch a wrong scale or broken matrix)."""
    from vector_mcp_spark.operators.projection import (
        project_embeddings,
        projection_matrix,
    )
    from vector_mcp_spark.suite import load

    embs = load(spark, "/root/testdata/sf0.001", "embeddings").limit(40)
    mat = projection_matrix(64, 16)
    rows = project_embeddings(embs, mat).select("embedding", "proj").collect()

    def d(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    ratios = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows), 5):
            orig = d(rows[i].embedding, rows[j].embedding)
            if orig > 0:
                ratios.append(d(rows[i].proj, rows[j].proj) / orig)
    ratios.sort()
    assert len(ratios) > 50
    median = ratios[len(ratios) // 2]
    assert 0.5 < median < 2.0
    inside = sum(1 for r in ratios if 0.25 < r < 4.0)
    assert inside / len(ratios) > 0.8


def test_label_centroids_hand_case(spark):
    from vector_mcp_spark.operators.centroids import label_centroids

    df = spark.createDataFrame(
        [
            (1, 0, [1.0, 0.0]),
            (2, 0, [0.0, 1.0]),
            (3, 1, [2.0, 2.0]),
        ],
        "vec_id int, label int, embedding array<float>",
    )
    cents = {r.label: r.centroid for r in label_centroids(df).collect()}
    assert cents[0] == [0.5, 0.5]
    assert cents[1] == [2.0, 2.0]


def test_centroid_outliers_ranks_least_similar_first(spark):
    from vector_mcp_spark.operators.centroids import centroid_outliers

    # label 0: three aligned vectors and one near-orthogonal outlier
    df = spark.createDataFrame(
        [
            (1, 0, [1.0, 0.0, 0.0]),
            (2, 0, [0.9, 0.1, 0.0]),
            (3, 0, [1.0, 0.05, 0.0]),
            (4, 0, [0.0, 0.0, 1.0]),
        ],
        "vec_id int, label int, embedding array<float>",
    )
    out = centroid_outliers(df, k=2).collect()
    assert [r.vec_id for r in out] == [4, 2]
    assert out[0].rank == 1 and out[0].score < out[1].score


def test_ann_projected_topk_recall_gate(spark):
    """Two-stage projected ANN (64→32 coarse, shortlist 100/500, exact
    re-rank) must hold recall@5 ≥ 0.75 vs the exact operator — on
    hash-random embeddings, the worst case for any dimension reduction
    (structured real embeddings recall higher). Measured 0.81 at pin time."""
    from vector_mcp_spark.operators.projection import (
        ann_projected_topk,
        projection_matrix,
    )
    from vector_mcp_spark.operators.similarity import cosine_self_join_topk
    from vector_mcp_spark.suite import load

    embs = load(spark, "/root/testdata/sf0.01", "embeddings")
    qs = embs.where(F.col("vec_id") < 20)
    mat = projection_matrix(64, 32)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_projected_topk(
            qs, embs, k=5, matrix=mat, shortlist=100, id_col="vec_id"
        ).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_self_join_topk(
            qs, embs, k=5, id_col="vec_id", emb_col="embedding"
        ).collect()
    }
    assert len(exact) == 100
    assert len(approx & exact) / len(exact) >= 0.75


def test_pq_perfectly_clustered_corpus_zero_error(spark):
    """Two exact subvector patterns, k=2 per subspace: after one Lloyd
    round the codebook IS the patterns, reconstruction error is 0, and
    same-pattern vectors share codes."""
    from vector_mcp_spark.operators.pq import pq_build

    import hashlib

    a = [1.0, 2.0, 1.0, 2.0]
    b = [-3.0, 0.5, -3.0, 0.5]
    # the two sha-ordered seed rows must cover BOTH patterns or k-means
    # (correctly) can't reach zero error — assign patterns accordingly
    ids = list(range(40))
    by_sha = sorted(ids, key=lambda i: hashlib.sha256(str(i).encode()).hexdigest())
    pattern = {i: i % 2 for i in ids}
    pattern[by_sha[0]], pattern[by_sha[1]] = 0, 1
    rows = [(i, a if pattern[i] == 0 else b) for i in ids]
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    encoded, codebooks = pq_build(df, m=2, n_codes=2, id_col="id", iters=1)
    got = encoded.select("id", "codes", "mse").collect()
    assert all(r.mse == 0.0 for r in got)
    by_pattern = {0: set(), 1: set()}
    for r in got:
        by_pattern[pattern[r.id]].add(tuple(r.codes))
    assert len(by_pattern[0]) == 1 and len(by_pattern[1]) == 1
    assert by_pattern[0] != by_pattern[1]
    assert len(codebooks) == 2 and all(len(cb) == 2 for cb in codebooks)
    # determinism: a rebuild produces identical codes
    again = {r.id: tuple(r.codes) for r in pq_build(df, m=2, n_codes=2, id_col="id", iters=1)[0].collect()}
    assert again == {r.id: tuple(r.codes) for r in got}


def test_pq_adc_ranks_by_reconstruction_distance(spark, sf_dir):
    """ADC distances must equal the exact L2^2 between the query and each
    vector's PQ reconstruction — table lookups lose nothing vs decoding."""
    import math

    from vector_mcp_spark.operators.pq import pq_adc_topk, pq_build
    from vector_mcp_spark.suite import SEM_QUERY_VEC, load

    embs = load(spark, sf_dir, "embeddings")
    encoded, cbs = pq_build(embs, m=4, n_codes=16, id_col="vec_id", iters=1)
    got = pq_adc_topk(encoded, cbs, SEM_QUERY_VEC, 5, id_col="vec_id").collect()
    assert [r.rank for r in got] == [1, 2, 3, 4, 5]
    codes = {r.vec_id: r.codes for r in encoded.select("vec_id", "codes").collect()}
    sub = 16
    for r in got:
        recon = [x for s in range(4) for x in cbs[s][codes[r.vec_id][s]]]
        exact = sum(
            (float(q) - float(x)) ** 2 for q, x in zip(SEM_QUERY_VEC, recon)
        )
        assert math.isclose(r.adc_dist, exact, rel_tol=0, abs_tol=5e-7)


@pytest.mark.slow
def test_ivf_pq_adc_composed_pipeline_recall(spark):
    """The classic IVF-PQ serving composition, end to end: probe nprobe
    clusters (IVF), score ONLY those candidates from PQ codes (ADC),
    exact re-rank the shortlist — and hold recall@5 ≥ 0.6 vs the exact
    scorer on hash-random worst-case vectors (ADC is the weak stage there;
    shortlist 150 of ~300 probed measured 0.72 at pin time)."""
    from pyspark.sql import functions as F

    from vector_mcp_spark.operators.pq import pq_adc_topk, pq_build
    from vector_mcp_spark.operators.similarity import (
        cosine_self_join_topk,
        ivf_build,
    )
    from vector_mcp_spark.suite import load

    embs = load(spark, "/root/testdata/sf0.01", "embeddings")
    assigned, cents = ivf_build(embs, n_centroids=16, id_col="vec_id", max_iter=2)
    encoded, cbs = pq_build(assigned, m=4, n_codes=16, id_col="vec_id", iters=1)
    queries = {r.vec_id: list(r.embedding) for r in embs.where(F.col("vec_id") < 10).collect()}

    import numpy as np

    cmat = np.asarray(cents, dtype=np.float64)
    hits = set()
    for qid, qv in queries.items():
        q = np.asarray(qv, dtype=np.float64)
        sims = cmat @ q / (np.linalg.norm(cmat, axis=1) * np.linalg.norm(q) + 1e-12)
        probe = set(int(i) for i in np.argsort(-sims)[:8])
        cand = encoded.where(
            F.col("cluster").isin(*probe) & (F.col("vec_id") != qid)
        )
        short_ids = [r.vec_id for r in pq_adc_topk(cand, cbs, qv, 150, id_col="vec_id").collect()]
        rer = cosine_self_join_topk(
            embs.where(F.col("vec_id") == qid),
            embs.where(F.col("vec_id").isin(short_ids)),
            5, id_col="vec_id", emb_col="embedding",
        )
        hits |= {(r.query_id, r.neighbor_id) for r in rer.collect()}
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_self_join_topk(
            embs.where(F.col("vec_id") < 10), embs, 5, id_col="vec_id", emb_col="embedding"
        ).collect()
    }
    assert len(exact) == 50
    assert len(hits & exact) / len(exact) >= 0.6


def test_sign_pack_invariants(spark):
    """Identical vectors → Hamming 0; a sign-flipped vector → Hamming 64;
    packed halves reproduce the per-dimension sign bits exactly."""
    from vector_mcp_spark.operators.quantize import sign_pack

    v = [(1.0 if i % 3 else -1.0) for i in range(64)]
    neg = [-x for x in v]
    df = spark.createDataFrame(
        [(0, v), (1, v), (2, neg)], "vec_id long, embedding array<double>"
    )
    rows = {r.vec_id: r for r in sign_pack(df).collect()}
    assert (rows[0].lo, rows[0].hi) == (rows[1].lo, rows[1].hi)
    expected_lo = sum(1 << i for i in range(32) if v[i] > 0)
    expected_hi = sum(1 << i for i in range(32) if v[32 + i] > 0)
    assert (rows[0].lo, rows[0].hi) == (expected_lo, expected_hi)
    ham = bin(rows[0].lo ^ rows[2].lo).count("1") + bin(rows[0].hi ^ rows[2].hi).count("1")
    assert ham == 64


def test_binary_sign_topk_recall_gate(spark):
    """1-bit sign quantization + Hamming shortlist (100 of 6000) + exact
    re-rank must hold recall@5 ≥ 0.6 vs the exact operator on hash-random
    embeddings — the hardest input for sign quantization (no dominant
    directions). Measured at pin time; see RECALL.md."""
    from vector_mcp_spark.operators.quantize import binary_hamming_topk
    from vector_mcp_spark.operators.similarity import cosine_self_join_topk
    from vector_mcp_spark.suite import load

    embs = load(spark, "/root/testdata/sf0.01", "embeddings")
    qs = embs.where(F.col("vec_id") < 20)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in binary_hamming_topk(qs, embs, k=5, shortlist=100, id_col="vec_id").collect()
    }
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_self_join_topk(
            qs, embs, k=5, id_col="vec_id", emb_col="embedding"
        ).collect()
    }
    assert len(exact) == 100
    assert len(approx & exact) / len(exact) >= 0.6


def test_isotropy_report_hand_cases(spark):
    """Identical vectors → avg pairwise cosine 1 and mean_cos_ratio 1;
    a perfectly balanced ± pair → cosine −1 and zero mean vector."""
    from vector_mcp_spark.operators.diagnostics import isotropy_report

    same = spark.createDataFrame(
        [(i, [3.0, 4.0] + [0.0] * 62) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    r = isotropy_report(same).collect()[0]
    assert r.n == 4 and r.avg_norm == 5.0
    assert r.avg_pairwise_cosine == 1.0 and r.mean_cos_ratio == 1.0

    v = [1.0] * 64
    anti = spark.createDataFrame(
        [(0, v), (1, [-x for x in v])], "vec_id long, embedding array<double>"
    )
    r2 = isotropy_report(anti).collect()[0]
    assert r2.avg_pairwise_cosine == -1.0 and r2.mean_vec_norm == 0.0
