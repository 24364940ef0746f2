import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from fashion_knowledge_graph_spark.operators.quantize import quantize_int8


def _py_quant(vec):
    v = np.asarray(vec, dtype=np.float64)
    if v.size == 0:
        return 0.0, [], 0, 0, 0.0, 0.0
    scale = float(np.max(np.abs(v)))
    if scale == 0.0:
        q = np.zeros(v.size, dtype=np.int64)
    else:
        q = np.floor(v * 127.0 / scale + 0.5).astype(np.int64)
    recon = q * scale / 127.0
    err = np.abs(recon - v)
    return (scale, q.tolist(), int(q.sum()), int(np.abs(q).sum()),
            float(err.max()), float((err * err).sum() / v.size))


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(11)
    rows = [(i, rng.normal(size=16).astype(np.float32).tolist())
            for i in range(40)]
    rows.append((100, [0.0] * 16))          # zero vector
    rows.append((101, []))                  # empty vector
    rows.append((102, [2.5]))               # single element
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_quantize_matches_python_reference(spark, vecs):
    out = {r["id"]: r for r in
           quantize_int8(vecs, "vec_id", "embedding").collect()}
    src = {r["vec_id"]: r["embedding"] for r in vecs.collect()}
    assert set(out) == set(src)
    for vid, vec in src.items():
        scale, q, qs, ql1, maxe, mse = _py_quant(vec)
        r = out[vid]
        assert math.isclose(r["scale"], scale, rel_tol=0, abs_tol=0)
        assert r["qvec"] == q
        assert r["q_sum"] == qs and r["q_l1"] == ql1
        assert math.isclose(r["max_err"], maxe, abs_tol=1e-15)
        assert math.isclose(r["mse"], mse, abs_tol=1e-18)


def test_quantize_codes_in_int8_range_and_cosine_preserved(spark, vecs):
    rows = quantize_int8(vecs.filter(F.col("vec_id") < 100),
                         "vec_id", "embedding").collect()
    src = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
           for r in vecs.filter(F.col("vec_id") < 100).collect()}
    for r in rows:
        q = np.asarray(r["qvec"])
        assert q.min() >= -127 and q.max() <= 127
        recon = q * r["scale"] / 127.0
        v = src[r["id"]]
        cos = float(recon @ v / (np.linalg.norm(recon) * np.linalg.norm(v)))
        assert cos > 0.995        # int8 keeps cosine to ~0.5%


def test_quantize_trailing_empty_vector(spark):
    # empty vector LAST in the batch: segment offsets hit len(flat) —
    # the padded-reduceat path, not the clamp-and-corrupt path
    df = spark.createDataFrame(
        [(1, [1.0, -4.0]), (2, [])],
        "vec_id bigint, embedding array<float>").coalesce(1)
    out = {r["id"]: r for r in
           quantize_int8(df, "vec_id", "embedding").collect()}
    assert out[1]["qvec"] == [32, -127] and out[1]["scale"] == 4.0
    assert out[2]["qvec"] == [] and out[2]["scale"] == 0.0
    assert out[2]["q_sum"] == 0 and out[2]["max_err"] == 0.0


def test_int8_topk_recall_vs_float_path(spark):
    # 200 vectors, 32-d: int8 search must agree with exact float
    # search on nearly every top-1 and most of top-5 (quantization
    # noise can only flip genuine near-ties)
    from fashion_knowledge_graph_spark.operators.quantize import (
        int8_cosine_topk,
        quantize_int8,
    )
    from fashion_knowledge_graph_spark.operators.similarity import (
        cosine_topk,
    )

    rng = np.random.default_rng(5)
    rows = [(i, rng.normal(size=32).astype(np.float32).tolist())
            for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 30)

    exact = cosine_topk(q, emb, k=5).collect()
    qz = quantize_int8(emb).select("id", "qvec")
    got = int8_cosine_topk(qz.filter(F.col("id") < 30), qz, k=5).collect()

    def tops(rows_, r):
        return {x["query_id"]: x["corpus_id"] for x in rows_
                if x["rank"] == r}

    t1_exact, t1_int8 = tops(exact, 1), tops(got, 1)
    assert set(t1_exact) == set(t1_int8)
    agree = sum(t1_exact[k_] == t1_int8[k_] for k_ in t1_exact)
    assert agree >= 0.95 * len(t1_exact), (agree, len(t1_exact))

    top5e = {(x["query_id"], x["corpus_id"]) for x in exact}
    top5q = {(x["query_id"], x["corpus_id"]) for x in got}
    assert len(top5e & top5q) >= 0.9 * len(top5e)
