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


def _pq_py(base, m, k, iterations):
    """Reference PQ training: first-k init, Lloyd with empty clusters
    keeping their centroid, argmin ties to the smaller id."""
    import numpy as np

    d = base.shape[1]
    dsub = d // m
    books = np.stack([base[:k, i * dsub:(i + 1) * dsub]
                      for i in range(m)])
    for _ in range(iterations):
        new = books.copy()
        for i in range(m):
            xs = base[:, i * dsub:(i + 1) * dsub]
            sq = ((xs[:, None, :] - books[i][None, :, :]) ** 2).sum(axis=2)
            cl = np.argmin(sq, axis=1)
            for kk in range(k):
                msk = cl == kk
                if msk.any():
                    new[i][kk] = xs[msk].mean(axis=0)
        books = new
    return books


def test_pq_train_encode_matches_numpy(spark):
    import numpy as np

    from fashion_knowledge_graph_spark.operators.quantize import (
        pq_encode, pq_train,
    )

    rng = np.random.RandomState(11)
    base = rng.randn(80, 8)
    rows = [(i, base[i].tolist()) for i in range(len(base))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq_train(df, m=2, k=4, iterations=2)
    exp_books = _pq_py(base, m=2, k=4, iterations=2)
    assert np.allclose(books, exp_books, atol=1e-12)

    codes = {r["vec_id"]: list(r["codes"])
             for r in pq_encode(df, books).collect()}
    for i in range(len(base)):
        exp = []
        for s in range(2):
            xs = base[i, s * 4:(s + 1) * 4]
            sq = ((xs[None, :] - exp_books[s]) ** 2).sum(axis=1)
            exp.append(int(sq.argmin()))
        assert codes[i] == exp, i


def test_pq_train_partition_invariance(spark):
    import numpy as np

    from fashion_knowledge_graph_spark.operators.quantize import pq_train

    rng = np.random.RandomState(5)
    rows = [(i, rng.randn(8).tolist()) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = pq_train(df, m=2, k=4, iterations=1)
    b = pq_train(df.repartition(13), m=2, k=4, iterations=1)
    assert np.allclose(a, b, atol=1e-12)


def test_pq_adc_recall_on_blobs(spark):
    """On well-separated blobs the ADC top-1 neighbor must share the
    query's blob, and ADC recall@10 vs exact L2 top-10 stays high —
    the compression is 8 floats → 2 codes yet neighborhoods survive."""
    import numpy as np

    from fashion_knowledge_graph_spark.operators.quantize import (
        pq_adc_topk, pq_encode, pq_train,
    )

    rng = np.random.RandomState(3)
    centers = rng.randn(5, 8) * 8
    # INTERLEAVED blob membership (i % 5): the deterministic first-k
    # init then spans all blobs — the operator's documented init
    # contract assumes ids aren't adversarially sorted by cluster
    labels = np.arange(200) % 5
    base = centers[labels] + rng.randn(200, 8) * 0.4
    rows = [(i, base[i].tolist()) for i in range(len(base))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq_train(df, m=2, k=32, iterations=2)
    codes = pq_encode(df, books)
    qids = [0, 1, 2, 3, 4]                  # one per blob
    queries = [(q, base[q].tolist()) for q in qids]
    got = pq_adc_topk(codes, books, queries, topk=10) \
        .orderBy("query_id", "adc_dist", "vec_id").collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r["vec_id"])
    recalls = []
    for q in qids:
        exact = np.argsort(((base - base[q]) ** 2).sum(axis=1))[:10]
        # top ADC hit lives in the query's blob
        assert labels[per_q[q][0]] == labels[q]
        recalls.append(len(set(per_q[q]) & set(exact.tolist())) / 10)
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_ivfpq_full_probe_equals_exhaustive_pq(spark):
    """nprobe = ncoarse probes every inverted list — IVF-PQ must then
    return EXACTLY the exhaustive ADC result (same codebook
    contract), proving the probe is a pure candidate filter."""
    import numpy as np

    from fashion_knowledge_graph_spark.operators.quantize import (
        ivfpq_topk, pq_adc_topk, pq_encode, pq_train,
    )

    rng = np.random.RandomState(7)
    labels = np.arange(120) % 4
    centers = rng.randn(4, 8) * 6
    base = centers[labels] + rng.randn(120, 8) * 0.5
    rows = [(i, base[i].tolist()) for i in range(len(base))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = [(i, base[i].tolist()) for i in (0, 1, 2)]

    books = pq_train(df, m=2, k=8, iterations=1)
    codes = pq_encode(df, books)
    exhaustive = sorted(
        (r["query_id"], r["vec_id"], r["adc_dist"])
        for r in pq_adc_topk(codes, books, queries, topk=5).collect())
    ivf_full = sorted(
        (r["query_id"], r["vec_id"], r["adc_dist"])
        for r in ivfpq_topk(df, queries, ncoarse=4, nprobe=4, m=2, k=8,
                            iterations=1, topk=5).collect())
    assert ivf_full == exhaustive


def test_ivfpq_partial_probe_keeps_blob_neighbors(spark):
    import numpy as np

    from fashion_knowledge_graph_spark.operators.quantize import (
        ivfpq_topk,
    )

    rng = np.random.RandomState(9)
    labels = np.arange(160) % 4
    centers = rng.randn(4, 8) * 8
    base = centers[labels] + rng.randn(160, 8) * 0.4
    rows = [(i, base[i].tolist()) for i in range(len(base))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = [(q, base[q].tolist()) for q in (0, 1, 2, 3)]
    got = ivfpq_topk(df, queries, ncoarse=8, nprobe=2, m=2, k=16,
                     iterations=2, topk=5) \
        .orderBy("query_id", "adc_dist", "vec_id").collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r["vec_id"])
    for q, _v in queries:
        assert len(per_q[q]) == 5          # probed lists hold ≥ topk
        assert labels[per_q[q][0]] == labels[q]
        # majority of the shortlist shares the query's blob
        same = sum(labels[x] == labels[q] for x in per_q[q])
        assert same >= 3, (q, per_q[q])


def test_ivfpq_tiny_corpus_shrinks_codebooks(spark):
    """Corpora smaller than ncoarse/k shrink both codebooks to what
    exists; search still returns every reachable item."""
    import numpy as np

    from fashion_knowledge_graph_spark.operators.quantize import (
        ivfpq_topk,
    )

    rng = np.random.RandomState(2)
    rows = [(i, rng.randn(4).tolist()) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = [(0, rows[0][1])]
    got = ivfpq_topk(df, queries, ncoarse=16, nprobe=8, m=2, k=16,
                     iterations=1, topk=10).collect()
    # 5 lists of 1 item each (init = the 5 vectors), all probed
    assert {r["vec_id"] for r in got} == {0, 1, 2, 3, 4}
    assert all(r["query_id"] == 0 for r in got)
