"""ANN quality audit: recall@k of every approximate index vs the exact
scorer, on the real embeddings table → RECALL.md.

Methods: multi-probe LSH, IVF (nprobe sweep), two-stage random-projection,
PQ-ADC (with and without exact re-rank of a shortlist). Ground truth =
``cosine_self_join_topk``. Hash-random embeddings are the WORST case for
every method (no cluster structure to exploit), so these are recall
floors; structured real embeddings score higher.

Usage: python tools/recall_report.py [sf_dir] [out_path]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

K = 5
N_QUERIES = 20


def recall(approx: set, exact: set) -> float:
    return len(approx & exact) / len(exact)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "RECALL.md"

    from pyspark.sql import functions as F

    from vector_mcp_spark.operators.pq import pq_adc_topk, pq_build
    from vector_mcp_spark.operators.projection import (
        ann_projected_topk,
        projection_matrix,
    )
    from vector_mcp_spark.operators.similarity import (
        ann_ivf_topk,
        ann_lsh_topk,
        cosine_self_join_topk,
        ivf_build,
        lsh_bucketize,
    )
    from vector_mcp_spark.session import get_spark
    from vector_mcp_spark.suite import load

    spark = get_spark("recall_report")
    embs = load(spark, sf_dir, "embeddings")
    queries = embs.where(F.col("vec_id") < N_QUERIES)

    def pairs(df, qcol="query_id", ncol="neighbor_id"):
        return {(r[qcol], r[ncol]) for r in df.collect()}

    exact = pairs(cosine_self_join_topk(queries, embs, K, id_col="vec_id", emb_col="embedding"))

    rows = []

    for n_planes, n_tables, probe_bits in ((8, 4, 1), (4, 8, 0), (4, 8, 1)):
        bucketed, planes = lsh_bucketize(embs, dim=64, n_planes=n_planes, n_tables=n_tables)
        got = pairs(
            ann_lsh_topk(queries, bucketed, planes, K, id_col="vec_id",
                         multiprobe_bits=probe_bits)
        )
        rows.append(
            (f"LSH {n_planes} planes x {n_tables} tables, multiprobe={probe_bits}",
             recall(got, exact))
        )

    assigned, cents = ivf_build(embs, n_centroids=16, id_col="vec_id", max_iter=2)
    for nprobe in (4, 8, 12):
        got = pairs(ann_ivf_topk(queries, assigned, cents, K, nprobe=nprobe, id_col="vec_id"))
        rows.append((f"IVF 16 centroids, nprobe={nprobe}", recall(got, exact)))

    # L2-metric IVF (pgvector <-> / qdrant EUCLID): measured against the
    # exact EUCLIDEAN top-k, not the cosine one — different ground truth
    import math

    vecs_all = {r.vec_id: [float(x) for x in r.embedding] for r in embs.collect()}
    exact_l2 = set()
    for qid in range(N_QUERIES):
        qv = vecs_all[qid]
        best = sorted(
            (math.sqrt(sum((x - y) ** 2 for x, y in zip(v, qv))), nid)
            for nid, v in vecs_all.items()
            if nid != qid
        )[:K]
        exact_l2 |= {(qid, nid) for _, nid in best}
    assigned_l2, cents_l2 = ivf_build(
        embs, n_centroids=16, id_col="vec_id", max_iter=2, metric="l2"
    )
    for nprobe in (4, 12):
        got = pairs(
            ann_ivf_topk(
                queries, assigned_l2, cents_l2, K, nprobe=nprobe,
                id_col="vec_id", metric="l2",
            )
        )
        rows.append((f"IVF-L2 16 centroids, nprobe={nprobe} (vs exact L2)", recall(got, exact_l2)))

    from vector_mcp_spark.operators.graph_ann import ann_hnsw_topk, hnsw_build

    edges, meta = hnsw_build(assigned, m=12, id_col="vec_id")
    got = pairs(
        ann_hnsw_topk(queries, embs, edges, meta["entry"], k=K, ef=48, id_col="vec_id")
    )
    rows.append(("HNSW-style graph, M=12, ef=48, 7-hop beam", recall(got, exact)))

    # beam-width (numCandidates) sweep — the recall-vs-latency knob the
    # veneer's indexed_search exposes (mongodb defaults max(k*10, 100));
    # each row times the full 20-query beam at that ef, warm
    import time as _time

    for ef in (8, 16, 48, 96):
        fn = lambda: pairs(  # noqa: E731
            ann_hnsw_topk(queries, embs, edges, meta["entry"], k=K, ef=ef, id_col="vec_id")
        )
        fn()  # warm plans
        t0 = _time.time()
        got = fn()
        dt = _time.time() - t0
        rows.append(
            (f"HNSW beam sweep ef={ef} ({dt:.1f}s / {N_QUERIES} queries warm)",
             recall(got, exact))
        )

    # dot-metric (MIPS) graph: ground truth = exact INNER-PRODUCT top-k;
    # the graph shares the cosine coarse assignment (the engine's MIPS
    # compromise) but ranks edges and beam by raw dot
    exact_dot = set()
    for qid in range(N_QUERIES):
        qv = vecs_all[qid]
        best = sorted(
            (-sum(x * y for x, y in zip(v, qv)), nid)
            for nid, v in vecs_all.items()
            if nid != qid
        )[:K]
        exact_dot |= {(qid, nid) for _, nid in best}
    for nprobe in (4, 12):
        got = pairs(
            ann_ivf_topk(
                queries, assigned, cents, K, nprobe=nprobe,
                id_col="vec_id", metric="dot",
            )
        )
        rows.append(
            (f"IVF-dot 16 centroids, nprobe={nprobe} (vs exact dot)",
             recall(got, exact_dot))
        )
    edges_dot, meta_dot = hnsw_build(assigned, m=12, id_col="vec_id", metric="dot")
    got = pairs(
        ann_hnsw_topk(
            queries, embs, edges_dot, meta_dot["entry"], k=K, ef=48,
            id_col="vec_id", metric="dot",
        )
    )
    rows.append(("HNSW-dot graph, M=12, ef=48 (vs exact dot)", recall(got, exact_dot)))

    mat = projection_matrix(64, 32)
    got = pairs(ann_projected_topk(queries, embs, k=K, matrix=mat, shortlist=100, id_col="vec_id"))
    rows.append(("projected 64->32, shortlist=100, exact re-rank", recall(got, exact)))

    from vector_mcp_spark.operators.quantize import binary_hamming_topk

    got = pairs(binary_hamming_topk(queries, embs, k=K, shortlist=100, id_col="vec_id"))
    rows.append(("sign 1-bit, Hamming shortlist=100 + exact re-rank", recall(got, exact)))

    encoded, cbs = pq_build(embs, m=4, n_codes=16, id_col="vec_id", iters=1)
    qvecs = {r.vec_id: list(r.embedding) for r in queries.collect()}
    adc_hits, rerank_hits = set(), set()
    from vector_mcp_spark.operators.similarity import cosine_self_join_topk as exact_topk

    for qid, qv in sorted(qvecs.items()):
        short = pq_adc_topk(
            encoded.where(F.col("vec_id") != qid), cbs, qv, 50, id_col="vec_id"
        )
        ids = [r.vec_id for r in short.collect()]
        adc_hits |= {(qid, nid) for nid in ids[:K]}
        shortlist_df = embs.where(F.col("vec_id").isin(ids))
        rer = exact_topk(
            embs.where(F.col("vec_id") == qid), shortlist_df, K,
            id_col="vec_id", emb_col="embedding",
        )
        rerank_hits |= {(r.query_id, r.neighbor_id) for r in rer.collect()}
    rows.append(("PQ-ADC 4x16, top-5 raw", recall(adc_hits, exact)))
    rows.append(("PQ-ADC 4x16, shortlist=50 + exact re-rank", recall(rerank_hits, exact)))

    from vector_mcp_spark.operators.pq import ann_ivf_adc_topk

    ivfpq_hits = set()
    for qid, qv in sorted(qvecs.items()):
        got = ann_ivf_adc_topk(
            assigned, encoded.where(F.col("vec_id") != qid), cents, cbs, qv,
            K, nprobe=4, id_col="vec_id",
        )
        ivfpq_hits |= {(qid, r.vec_id) for r in got.collect()}
    rows.append(("IVF-PQ (nprobe=4 probe + ADC 4x16), top-5 raw", recall(ivfpq_hits, exact)))

    from vector_mcp_spark.operators.pq import ann_ivf_adc_rerank_topk

    ivfpq_rr_hits = set()
    for qid, qv in sorted(qvecs.items()):
        got = ann_ivf_adc_rerank_topk(
            assigned, encoded.where(F.col("vec_id") != qid), cents, cbs,
            embs.where(F.col("vec_id") != qid), qv, K,
            shortlist=50, nprobe=4, id_col="vec_id",
        )
        ivfpq_rr_hits |= {(qid, r.vec_id) for r in got.collect()}
    rows.append(
        ("IVF-PQ, shortlist=50 + exact re-rank", recall(ivfpq_rr_hits, exact))
    )

    lines = [
        "# ANN recall audit (generated by tools/recall_report.py)",
        "",
        f"recall@{K} over {N_QUERIES} queries at `{sf_dir}` vs the exact cosine "
        "top-k. Hash-random embeddings = worst case for every method; these "
        "are floors, not typicals.",
        "",
        "| method | recall@5 |",
        "|---|---|",
    ]
    for name, r in rows:
        lines.append(f"| {name} | {r:.2f} |")
    lines += [
        "",
        "PQ trades recall for memory (64× here) and leans on local structure "
        "uniform-random vectors don't have — its raw floor is low by design; "
        "production use is always shortlist + exact re-rank, and the re-rank "
        "row shows that path. The LSH multiprobe, IVF nprobe=12, IVF-L2 "
        "nprobe=12, IVF-dot nprobe=12, HNSW, HNSW-l2 (test_similarity), and "
        "HNSW-dot rows are the configurations the pytest recall gates pin "
        "(each ≥0.85, IVF-dot ≥0.8, LSH ≥0.9). The IVF-L2, IVF-dot, and "
        "HNSW-dot rows grade against their OWN exact ground truth "
        "(Euclidean / inner-product top-k), not the cosine one.",
        "",
    ]
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    for name, r in rows:
        print(f"{r:.2f}  {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
