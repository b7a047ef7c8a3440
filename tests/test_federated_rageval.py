"""Unit tests for the round-7 operators: federated cross-collection search,
retrieval-evaluation metrics, and changelog time-travel snapshots.

(The suite oracles cover these end-to-end at sf0.01; these tests pin the
edge-case semantics oracles can't express cleanly: empty hit sets, delete
masking, per-collection quota behavior.)
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def test_retrieval_metrics_perfect_and_miss(spark):
    from vector_mcp_spark.operators.rageval import retrieval_metrics

    # q1: system == gold (perfect); q2: zero overlap; q3: hit at rank 2 only
    gold = spark.createDataFrame(
        [(q, r, f"g{q}_{r}") for q in (1, 2, 3) for r in (1, 2)],
        "query_id int, rank int, neighbor_id string",
    )
    system = spark.createDataFrame(
        [(1, 1, "g1_1"), (1, 2, "g1_2"),
         (2, 1, "x"), (2, 2, "y"),
         (3, 1, "z"), (3, 2, "g3_1")],
        "query_id int, rank int, neighbor_id string",
    )
    got = {r.query_id: r for r in retrieval_metrics(system, gold, k=2).collect()}
    assert got[1].recall_at_k == 1.0 and got[1].mrr_at_k == 1.0 and got[1].ndcg_at_k == 1.0
    assert got[2].recall_at_k == 0.0 and got[2].mrr_at_k == 0.0 and got[2].ndcg_at_k == 0.0
    assert got[3].n_hits == 1 and got[3].recall_at_k == 0.5 and got[3].mrr_at_k == 0.5
    # DCG = 1/log2(3) at rank 2; IDCG = 1/log2(2) + 1/log2(3)
    import math

    want = (1 / math.log2(3)) / (1 / math.log2(2) + 1 / math.log2(3))
    assert abs(got[3].ndcg_at_k - round(want, 6)) < 1e-9


def test_retrieval_metrics_ignores_ranks_beyond_k(spark):
    from vector_mcp_spark.operators.rageval import retrieval_metrics

    gold = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b")], "query_id int, rank int, neighbor_id string"
    )
    system = spark.createDataFrame(
        [(1, 1, "x"), (1, 2, "y"), (1, 3, "a")],  # the only hit is PAST k=2
        "query_id int, rank int, neighbor_id string",
    )
    row = retrieval_metrics(system, gold, k=2).first()
    assert row.n_hits == 0 and row.recall_at_k == 0.0


def test_federated_topk_quota_and_global_rank(spark):
    from vector_mcp_spark.operators.federated import federated_topk

    # collection A holds the 3 best vectors; quota k_per=2 must cap it so B
    # gets representation in the fused ranking
    rows = [
        ("A", "a1", [1.0, 0.0]), ("A", "a2", [0.99, 0.1]), ("A", "a3", [0.98, 0.2]),
        ("B", "b1", [0.5, 0.5]), ("B", "b2", [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "collection string, id string, embedding array<double>")
    out = federated_topk(df, [1.0, 0.0], k_per_collection=2, n=4,
                         collection_col="collection", id_col="id").collect()
    assert [r.id for r in sorted(out, key=lambda r: r.rank)] == ["a1", "a2", "b1", "b2"]
    by_id = {r.id: r for r in out}
    assert "a3" not in by_id  # third-best overall, but over A's quota
    assert by_id["b1"].collection_rank == 1 and by_id["a2"].collection_rank == 2


def test_snapshot_asof_delete_masking_and_tiebreak(spark):
    from vector_mcp_spark.operators.cdc import snapshot_asof

    t = datetime(2024, 1, 10)
    rows = [
        # key 1: upsert then (post-cut) delete — survives with the pre-cut value
        (1, datetime(2024, 1, 5), 100, "upsert", 1.0),
        (1, datetime(2024, 1, 20), 101, "delete", 0.0),
        # key 2: latest pre-cut op is delete — absent from the snapshot
        (2, datetime(2024, 1, 4), 200, "upsert", 2.0),
        (2, datetime(2024, 1, 6), 201, "delete", 0.0),
        # key 3: equal ts — tiebreak picks the larger version id
        (3, datetime(2024, 1, 7), 300, "upsert", 3.0),
        (3, datetime(2024, 1, 7), 301, "upsert", 3.5),
    ]
    log = spark.createDataFrame(
        rows, "k int, ts timestamp, version int, op string, val double"
    )
    out = {
        r.k: r
        for r in snapshot_asof(
            log, asof=t, key_col="k", ts_col="ts", op_col="op",
            tiebreak_col="version", payload_cols=["version", "op", "val"],
        ).collect()
    }
    assert set(out) == {1, 3}
    assert out[1].version == 100 and out[1].val == 1.0 and out[1].n_versions == 1
    assert out[3].version == 301 and out[3].val == 3.5 and out[3].n_versions == 2


def test_snapshot_asof_moves_with_the_cut(spark):
    """Later cut, later state: the same changelog read at two timestamps
    yields the two historical table versions (the time-travel contract)."""
    from vector_mcp_spark.operators.cdc import snapshot_asof

    rows = [
        (1, datetime(2024, 1, 1), 1, "upsert", 10.0),
        (1, datetime(2024, 1, 15), 2, "upsert", 20.0),
    ]
    log = spark.createDataFrame(
        rows, "k int, ts timestamp, version int, op string, val double"
    )
    early = snapshot_asof(log, asof=datetime(2024, 1, 2), key_col="k",
                          ts_col="ts", op_col="op", tiebreak_col="version",
                          payload_cols=["version", "op", "val"]).first()
    late = snapshot_asof(log, asof=datetime(2024, 2, 1), key_col="k",
                         ts_col="ts", op_col="op", tiebreak_col="version",
                         payload_cols=["version", "op", "val"]).first()
    assert early.val == 10.0 and early.n_versions == 1
    assert late.val == 20.0 and late.n_versions == 2
