"""pack_greedy: greedy fixed-budget sequence packing (LLM training)."""

import pytest
from pyspark.sql import functions as F

from fashion_knowledge_graph_spark.operators.packing import pack_greedy


def _pack_py(rows, capacity, shard_width):
    """Reference greedy packing: rows = [(id, tokens)]."""
    out = {}
    shards = {}
    for i, t in sorted(rows):
        shards.setdefault(i // shard_width, []).append((i, t))
    for shard, docs in shards.items():
        fill, b = 0, 0
        first = True
        for i, t in docs:
            if first:
                fill, first = t, False
            elif fill + t > capacity:
                b, fill = b + 1, t
            else:
                fill += t
            out[i] = (shard, b, fill)
    return out


@pytest.fixture(scope="module")
def doc_rows():
    # deterministic pseudo-random token counts incl. oversize docs
    return [(i, (i * 37 + 11) % 900 + ((i % 13 == 0) * 3000))
            for i in range(500)]


def test_pack_matches_python_reference(spark, doc_rows):
    df = spark.createDataFrame(doc_rows, "doc_id long, n_tokens long")
    got = {r["id"]: (r["shard"], r["bin"], r["fill_after"])
           for r in pack_greedy(df, capacity=2048, shard_width=100).collect()}
    assert got == _pack_py(doc_rows, 2048, 100)


def test_pack_partitioning_invariance(spark, doc_rows):
    df = spark.createDataFrame(doc_rows, "doc_id long, n_tokens long")
    a = sorted(map(tuple, pack_greedy(
        df.repartition(1), capacity=1000, shard_width=64).collect()))
    b = sorted(map(tuple, pack_greedy(
        df.repartition(16), capacity=1000, shard_width=64).collect()))
    assert a == b


def test_pack_bin_budget_respected(spark, doc_rows):
    df = spark.createDataFrame(doc_rows, "doc_id long, n_tokens long")
    out = pack_greedy(df, capacity=2048, shard_width=100)
    joined = out.join(
        df.select(F.col("doc_id").alias("id"), "n_tokens"), "id")
    totals = joined.groupBy("shard", "bin").agg(
        F.sum("n_tokens").alias("total"),
        F.count(F.lit(1)).alias("n")).collect()
    for r in totals:
        # a bin only exceeds capacity when it holds a single oversize doc
        assert r["total"] <= 2048 or r["n"] == 1


def test_pack_oversize_doc_gets_own_bin(spark):
    rows = [(0, 100), (1, 5000), (2, 100)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {r["id"]: r["bin"]
           for r in pack_greedy(df, capacity=1000, shard_width=10).collect()}
    assert got == {0: 0, 1: 1, 2: 2}
