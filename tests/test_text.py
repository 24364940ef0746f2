import hashlib
import re

import pytest
from pyspark.sql import functions as F

from fashion_knowledge_graph_spark.functions import text as tx


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox, and the lazy dog!! 42 times."),
        (2, "el perro y la casa de la playa en un lugar"),
        (3, "zzz qqq"),
        (4, ""),
        (5, "The THE the a And of to in is that"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def _norm(s):
    return re.sub(r"[^a-z0-9]+", " ", s.lower()).strip()


def test_tokens_and_counts(spark, docs):
    got = docs.select("doc_id", tx.token_count(F.col("text")).alias("n")) \
        .orderBy("doc_id").collect()
    for r in got:
        s = dict((x["doc_id"], x["text"]) for x in docs.collect())[r["doc_id"]]
        exp = len([t for t in _norm(s).split(" ") if t])
        assert r["n"] == exp, (r["doc_id"], r["n"], exp)


def test_char_stats_ratios(spark, docs):
    st = tx.char_stats(F.col("text"))
    row = docs.filter("doc_id = 1").select(
        *[v.alias(k) for k, v in st.items()]).collect()[0]
    s = "The quick brown fox, and the lazy dog!! 42 times."
    assert row["n_chars"] == len(s)
    n = len(s)
    assert row["punct_ratio"] == pytest.approx(
        len(re.findall(r"[^\w\s]", s)) / n)
    assert row["digit_ratio"] == pytest.approx(
        len(re.findall(r"[0-9]", s)) / n)
    assert row["upper_ratio"] == pytest.approx(
        len(re.findall(r"[A-Z]", s)) / n)


def test_quality_score_bounds(spark, docs):
    rows = docs.select(tx.quality_score(F.col("text")).alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_lang_id(spark, docs):
    got = {r["doc_id"]: (r["lang_pred"], r["lang_hits"])
           for r in tx.lang_id(docs).collect()}
    assert got[1][0] == "en"
    assert got[2][0] == "es"
    assert got[3] == ("und", 0)   # no stopword hits
    assert got[4] == ("und", 0)
    assert got[5][0] == "en"
    assert len(got) == 5


def test_fingerprint_md5(spark, docs):
    got = docs.filter("doc_id = 1").select(
        tx.fingerprint_md5(F.col("text")).alias("fp")).collect()[0]["fp"]
    s = _norm("The quick brown fox, and the lazy dog!! 42 times.")
    assert got == hashlib.md5(s.encode()).hexdigest()


def test_shingles_and_sketch(spark, docs):
    r = docs.filter("doc_id = 1").select(
        tx.shingles(F.col("text"), 3).alias("sh"),
        tx.minhash_sketch_col(F.col("text"), k=4, n=3).alias("sk")
    ).collect()[0]
    toks = _norm("The quick brown fox, and the lazy dog!! 42 times.").split()
    exp = sorted({" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)})
    assert sorted(r["sh"]) == exp
    # sketch = 4 smallest md5-60bit hashes of those shingles
    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    assert list(r["sk"]) == sorted(h(s) for s in exp)[:4]
    # short doc → whole-doc shingle
    short = docs.filter("doc_id = 3").select(
        tx.shingles(F.col("text"), 3).alias("sh")).collect()[0]["sh"]
    assert list(short) == ["zzz qqq"]


def test_lang_id_matches_python_reference_on_nasty_corpus(spark):
    """Pin the zero-shuffle regexp_count lang_id against a pure-Python
    token-set reference on a seeded corpus mixing stopwords from all
    languages, near-miss tokens, digits, unicode, and punctuation —
    the cases where \\b word-boundary counting could diverge from
    exact token matching."""
    import random
    import re as _re

    rng = random.Random(7)
    vocab = [t for toks in tx.LANG_STOPWORDS.values() for t in toks]
    vocab += ["thea", "athe", "a1", "1a", "aaa", "ésta", "über", "naïve",
              "日本語", "de-facto", "l'eau", "co_op", "x", "42", ""]
    docs = []
    for i in range(300):
        k = rng.randint(0, 12)
        sep = rng.choice([" ", ", ", "!", "  ", ".", "-"])
        docs.append((i, sep.join(rng.choice(vocab) for _ in range(k))))
    docs += [(1000, None), (1001, "THE Ünd thé")]

    def ref(s):
        toks = [t for t in _re.sub(r"[^a-z0-9]+", " ", (s or "").lower())
                .split(" ") if t]
        best = ("und", 0)
        for lang in sorted(tx.LANG_STOPWORDS):
            hits = sum(t in tx.LANG_STOPWORDS[lang] for t in toks)
            if hits > best[1]:
                best = (lang, hits)
        return best

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["lang_pred"], r["lang_hits"])
           for r in tx.lang_id(df).collect()}
    want = {i: ref(s) for i, s in docs}
    assert got == want
