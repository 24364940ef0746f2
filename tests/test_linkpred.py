"""Deterministic corrupted-tail negative sampling vs a Python replay."""
import hashlib

import pytest
from pyspark.sql import functions as F

from fashion_knowledge_graph_spark.operators.linkpred import (
    negative_samples,
)

VOCAB = {"hasColor": ["red", "blue", "black", "white"],
         "hasStyle": ["casual", "formal"]}


def _h60(salt, key):
    return int(hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:15], 16)


def _replay(pos, k=2, salt="neg"):
    posset = set(pos)
    out = set()
    for s, p, o in pos:
        if p not in VOCAB:
            continue
        arr = VOCAB[p]
        n = len(arr)
        for i in range(k):
            idx = _h60(salt, f"{i}:{s}:{p}:{o}") % n
            cand = arr[idx]
            if cand == o:
                cand = arr[(idx + 1) % n]
            if cand != o and (s, p, cand) not in posset:
                out.add((s, p, cand, i))
    return out


@pytest.fixture(scope="module")
def pos_triples(spark):
    rows = [("p1", "hasColor", "red"), ("p1", "hasColor", "blue"),
            ("p2", "hasColor", "black"), ("p2", "hasStyle", "casual"),
            ("p3", "hasStyle", "formal"), ("p3", "type", "dress")]
    return rows, spark.createDataFrame(
        rows, "subj string, pred string, obj string")


def test_matches_python_replay(pos_triples):
    rows, df = pos_triples
    got = {tuple(r) for r in
           negative_samples(df, VOCAB, k=2).collect()}
    assert got == _replay(rows)
    assert got  # non-vacuous


def test_negatives_are_true_negatives_and_reproducible(pos_triples):
    rows, df = pos_triples
    out = negative_samples(df, VOCAB, k=3)
    posset = {(r[0], r[1], r[2]) for r in rows}
    for r in out.collect():
        assert (r.subj, r.pred, r.obj_neg) not in posset
        assert r.pred in VOCAB  # un-vocabed predicates skipped
    again = {tuple(r) for r in
             negative_samples(df, VOCAB, k=3).collect()}
    assert again == {tuple(r) for r in out.collect()}


def test_contracts(pos_triples):
    _, df = pos_triples
    with pytest.raises(ValueError, match="k must be"):
        negative_samples(df, VOCAB, k=0)
    with pytest.raises(ValueError, match="empty vocabulary"):
        negative_samples(df, {"hasColor": []})
    with pytest.raises(ValueError, match="duplicate"):
        negative_samples(df, {"hasColor": ["red", "red"]})
