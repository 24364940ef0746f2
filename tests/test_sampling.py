import hashlib

import pytest
from pyspark.sql import functions as F

from fashion_knowledge_graph_spark.operators.sampling import (
    HASH_SPACE,
    domain_sample,
    hash_split,
    rate_threshold,
    sample_hash,
)


def _py_hash(salt: str, key) -> int:
    return int(hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(3000)]
    return spark.createDataFrame(rows, "doc_id bigint, lang string")


def test_sample_hash_matches_python_md5(spark):
    df = spark.createDataFrame([(7,), (123456789012345,)], "k bigint")
    got = {r["k"]: r["h"] for r in
           df.select("k", sample_hash("k", "s").alias("h")).collect()}
    assert got == {k: _py_hash("s", k) for k in got}


def test_domain_sample_deterministic_across_partitionings(docs):
    a = domain_sample(docs, "doc_id", "lang", {"en": 0.5, "de": 0.2})
    b = domain_sample(docs.repartition(17, "lang"), "doc_id", "lang",
                      {"en": 0.5, "de": 0.2})
    ids_a = sorted(r["doc_id"] for r in a.collect())
    ids_b = sorted(r["doc_id"] for r in b.collect())
    assert ids_a == ids_b and ids_a
    # exact python replay of every keep decision
    expect = [i for i in range(3000)
              if _py_hash("mix", i) < rate_threshold(
                  {"en": 0.5, "de": 0.2}.get(["en", "de", "zh"][i % 3], 0.0))]
    assert ids_a == expect


def test_domain_sample_rates_are_calibrated(docs):
    kept = domain_sample(docs, "doc_id", "lang",
                         {"en": 0.5, "de": 0.2, "zh": 1.0}) \
        .groupBy("lang").count().collect()
    got = {r["lang"]: r["count"] for r in kept}
    assert got["zh"] == 1000                      # rate 1.0 keeps all
    assert abs(got["en"] - 500) < 60              # ~binomial 3σ
    assert abs(got["de"] - 200) < 50


def test_hash_split_disjoint_exhaustive_and_stable(docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = hash_split(docs, "doc_id", w).collect()
    assert len(out) == 3000
    counts = {}
    for r in out:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] - 2400) < 90
    # membership is per-key stable: a subset of the data gets the
    # identical assignment (append-safe splits)
    sub = hash_split(docs.filter(F.col("doc_id") < 100), "doc_id", w)
    full = {r["doc_id"]: r["split"] for r in out}
    for r in sub.collect():
        assert r["split"] == full[r["doc_id"]]


def test_hash_split_rejects_bad_weights(docs):
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", {"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError):
        rate_threshold(1.5)


def test_rate_threshold_bounds():
    assert rate_threshold(0.0) == 0
    assert rate_threshold(1.0) == HASH_SPACE


def test_weighted_sample_k_proportional_and_deterministic(spark):
    from fashion_knowledge_graph_spark.operators.sampling import (
        weighted_sample_k,
    )

    # two weight classes, 10x apart: across many salts, heavy rows
    # must be sampled ~10x as often (A-ES inclusion ∝ weight for
    # k << n); same salt ⇒ identical sample across partitionings
    rows = [(i, 10.0 if i % 2 == 0 else 1.0) for i in range(400)]
    df = spark.createDataFrame(rows, "k bigint, w double")
    heavy = light = 0
    for s in range(30):
        got = weighted_sample_k(df, "k", "w", k=10,
                                salt=f"s{s}").collect()
        assert len(got) == 10
        heavy += sum(1 for r in got if r["k"] % 2 == 0)
        light += sum(1 for r in got if r["k"] % 2 == 1)
    assert heavy + light == 300
    ratio = heavy / max(light, 1)
    assert 5.0 < ratio < 20.0, (heavy, light)

    a = sorted(r["k"] for r in weighted_sample_k(
        df, "k", "w", k=10, salt="fix").collect())
    b = sorted(r["k"] for r in weighted_sample_k(
        df.repartition(13), "k", "w", k=10, salt="fix").collect())
    assert a == b


def test_weighted_sample_k_grouped_and_zero_weight(spark):
    from fashion_knowledge_graph_spark.operators.sampling import (
        weighted_sample_k,
    )

    rows = [(i, ["a", "b"][i % 2], 0.0 if i < 4 else 1.0)
            for i in range(40)]
    df = spark.createDataFrame(rows, "k bigint, g string, w double")
    got = weighted_sample_k(df, "k", "w", k=3, by=["g"]).collect()
    per = {}
    for r in got:
        per.setdefault(r["g"], []).append(r["k"])
        assert r["k"] >= 4            # zero-weight rows never sampled
    assert sorted(per) == ["a", "b"]
    assert all(len(v) == 3 for v in per.values())


def test_temperature_weights_matches_python(spark):
    from fashion_knowledge_graph_spark.operators.sampling import (
        temperature_weights,
    )

    rows = [("web",)] * 100 + [("code",)] * 25 + [("books",)] * 4
    df = spark.createDataFrame(rows, "domain string")
    got = {r["domain"]: (r["n_docs"], r["weight"], r["expected_docs"])
           for r in temperature_weights(df, "domain", alpha=0.7,
                                        budget=1000).collect()}
    counts = {"web": 100, "code": 25, "books": 4}
    tot = sum(c ** 0.7 for c in counts.values())
    for d, c in counts.items():
        w = c ** 0.7 / tot
        assert got[d][0] == c
        assert got[d][1] == pytest.approx(w, abs=1e-12)
        assert got[d][2] == pytest.approx(round(w * 1000.0, 6), abs=1e-9)
    # weights sum to 1; α<1 upsamples the tail relative to proportional
    assert sum(w for _, w, _ in got.values()) == pytest.approx(1.0)
    assert got["books"][1] > 4 / 129
    assert got["web"][1] < 100 / 129


def test_temperature_weights_alpha_extremes(spark):
    from fashion_knowledge_graph_spark.operators.sampling import (
        temperature_weights,
    )

    rows = [("a",)] * 30 + [("b",)] * 10
    df = spark.createDataFrame(rows, "domain string")
    prop = {r["domain"]: r["weight"]
            for r in temperature_weights(df, "domain", alpha=1.0).collect()}
    assert prop["a"] == pytest.approx(0.75) and prop["b"] == pytest.approx(0.25)
    unif = {r["domain"]: r["weight"]
            for r in temperature_weights(df, "domain", alpha=0.0).collect()}
    assert unif["a"] == pytest.approx(0.5) and unif["b"] == pytest.approx(0.5)


def test_poisson_bootstrap_mean_python_parity(spark):
    import hashlib
    import math

    from fashion_knowledge_graph_spark.operators.sampling import (
        poisson_bootstrap_mean,
    )

    rows = [(i, float(10 + (i * 7) % 20)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, y double")
    B = 32
    r = poisson_bootstrap_mean(df, "id", "y", b=B,
                               salt="t").collect()[0]
    # python replay of the whole pipeline
    ths, acc, fact = [], 0.0, 1.0
    for k in range(9):
        if k > 0:
            fact *= k
        acc += math.exp(-1.0) / fact
        ths.append(acc)

    def u(b, i):
        h = int(hashlib.md5(f"t:{b}:{i}".encode()).hexdigest()[:15], 16)
        return h / float(1 << 60)

    def pw(x):
        for k, t in enumerate(ths):
            if x < t:
                return k
        return 9

    means = []
    for b in range(B):
        ws = [(pw(u(b, i)), y) for i, y in rows]
        sw = sum(w for w, _ in ws)
        means.append(sum(w * y for w, y in ws) / sw)
    means.sort()

    def pct(p):
        pos = p * (len(means) - 1)
        lo = int(pos)
        frac = pos - lo
        hi = min(lo + 1, len(means) - 1)
        return means[lo] + frac * (means[hi] - means[lo])

    assert r.n == 40
    assert r.point_mean == round(sum(y for _, y in rows) / 40, 6)
    assert r.ci_lo == round(pct(0.025), 6)
    assert r.ci_hi == round(pct(0.975), 6)
    # the interval actually brackets the point estimate
    assert r.ci_lo < r.point_mean < r.ci_hi
