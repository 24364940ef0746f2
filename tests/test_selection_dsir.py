"""DSIR importance weights vs a pure-Python replay."""
import hashlib
import math
import re

from pyspark.sql import functions as F

from fashion_knowledge_graph_spark.operators.selection import (
    dsir_log_weights,
)

ROWS = [
    (1, "the quick brown fox jumps over the lazy dog", "en"),
    (2, "the cat and the hat sat on the flat mat", "en"),
    (3, "der schnelle braune fuchs springt hoch", "de"),
    (4, "le chat noir dort sur le tapis rouge", "fr"),
    (5, "the dog and the fox ran over the hill", "en"),
    (6, "ein hund und eine katze laufen schnell", "de"),
]


def _tok(text):
    norm = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    return [w for w in norm.split(" ") if w]


def _bucket(w, salt="dsir", buckets=64):
    h = hashlib.md5(f"{salt}:{w}".encode()).hexdigest()[:15]
    return int(h, 16) % buckets


def _py_dsir(rows, buckets=64):
    raw, tgt = {}, {}
    r_tot = t_tot = 0
    for _, text, lang in rows:
        for w in _tok(text):
            b = _bucket(w)
            raw[b] = raw.get(b, 0) + 1
            r_tot += 1
            if lang == "en":
                tgt[b] = tgt.get(b, 0) + 1
                t_tot += 1
    out = {}
    for doc_id, text, lang in rows:
        s = 0.0
        for w in _tok(text):
            b = _bucket(w)
            s += (math.log((tgt.get(b, 0) + 1) / (t_tot + buckets))
                  - math.log((raw.get(b, 0) + 1) / (r_tot + buckets)))
        out[doc_id] = (lang, len(_tok(text)), round(s, 6))
    return out


def test_dsir_matches_python_replay(spark):
    docs = spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string")
    got = {r["doc_id"]: (r["lang"], r["n_tokens"], r["dsir_logw"])
           for r in dsir_log_weights(
               docs, target_pred=(F.col("lang") == "en"),
               k=10).collect()}
    assert got == _py_dsir(ROWS)


def test_dsir_ranks_target_docs_first(spark):
    docs = spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string")
    top = dsir_log_weights(
        docs, target_pred=(F.col("lang") == "en"), k=3).collect()
    # the three English docs must outrank the non-target ones
    assert {r["lang"] for r in top} == {"en"}
    assert all(r["dsir_logw"] > 0 for r in top)
