import hashlib

import pytest

from fashion_knowledge_graph_spark.operators.features import (
    target_encode_loo,
)


def _h60(s):
    return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def facts(spark):
    rows = [(i, ["A", "B", "C"][i % 3], float(i % 10)) for i in range(90)]
    rows += [(1000, "rare", 99.0)]       # single-row category
    return spark.createDataFrame(rows, "id long, cat string, y double")


def test_target_encode_loo_python_parity(spark, facts):
    K, W = 3, 10.0
    got = {(r.cat, r.fold): (r.n_fold, r.encoding)
           for r in target_encode_loo(facts, "id", "cat", "y",
                                      n_folds=K,
                                      prior_weight=W).collect()}
    rows = [(r.id, r.cat, r.y) for r in facts.collect()]
    mu = sum(y for _, _, y in rows) / len(rows)
    import collections
    per = collections.defaultdict(lambda: [0, 0.0])
    for i, c, y in rows:
        per[(c, _h60(i) % K)][0] += 1
        per[(c, _h60(i) % K)][1] += y
    tot = collections.defaultdict(lambda: [0, 0.0])
    for (c, f), (n, s) in per.items():
        tot[c][0] += n
        tot[c][1] += s
    want = {}
    for (c, f), (n, s) in per.items():
        n_oof = tot[c][0] - n
        s_oof = tot[c][1] - s
        want[(c, f)] = (n, round((s_oof + W * mu) / (n_oof + W), 6))
    assert got == want


def test_target_encode_no_own_label_leak(spark, facts):
    # single-row category: its only fold's encoding must be the pure
    # prior (its own label contributes NOTHING)
    rows = target_encode_loo(facts, "id", "cat", "y",
                             n_folds=3).collect()
    rare = [r for r in rows if r.cat == "rare"]
    assert len(rare) == 1 and rare[0].n_fold == 1
    all_rows = [(r.id, r.y) for r in facts.collect()]
    mu = sum(y for _, y in all_rows) / len(all_rows)
    assert rare[0].encoding == round(mu, 6)  # (0 + w*mu) / (0 + w)
    # and NOT the leaky value 99.0
    assert abs(rare[0].encoding - 99.0) > 1


def test_target_encode_fold_assignment_is_stable(spark, facts):
    a = target_encode_loo(facts, "id", "cat", "y", n_folds=3).collect()
    b = target_encode_loo(facts.repartition(7), "id", "cat", "y",
                          n_folds=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_feature_hash_python_parity_and_cancellation(spark):
    from fashion_knowledge_graph_spark.operators.features import (
        feature_hash,
    )
    rows = [(1, "red"), (1, "red"), (1, "dress"), (2, "blue"),
            (2, None)]
    df = spark.createDataFrame(rows, "doc long, tok string")
    D = 16
    got = {(r.doc, r.bucket): r.value for r in
           feature_hash(df, "doc", "tok", dim=D).collect()}

    def b(t):
        return _h60("b:" + t) % D

    def s(t):
        return 1 if _h60("s:" + t) % 2 == 1 else -1

    import collections
    want = collections.defaultdict(int)
    for d, t in rows:
        if t is not None:
            want[(d, b(t))] += s(t)
    want = {k: v for k, v in want.items() if v != 0}
    assert got == want
    # duplicate tokens accumulate: |value| for doc1's 'red' bucket
    # is 2 (unless 'dress' collides and cancels — then it is 1)
    assert any(abs(v) >= 1 for (d, _), v in got.items() if d == 1)
    # rerun identical
    again = {(r.doc, r.bucket): r.value for r in
             feature_hash(df, "doc", "tok", dim=D).collect()}
    assert got == again
