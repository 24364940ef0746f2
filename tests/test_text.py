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


# ------------------------------------------------------------- PII scan
@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (1, "reach me at jane.doe+x@mail.example.org today"),
        (2, "see https://a-b.example.com/path?q=1 and http://x.io"),
        (3, "call (212) 555-0123 or 917-555-0199 now"),
        (4, "server at 10.0.0.254 timed out"),
        (5, "nothing sensitive here, just 12345"),
        (6, "mixed a@b.io https://c.d/e 555-867-5309 1.2.3.4"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_pii_counts(spark, pii_docs):
    pc = tx.pii_counts(F.col("text"))
    got = {r["doc_id"]: (r["e"], r["p"], r["u"], r["i"]) for r in
           pii_docs.select("doc_id", pc["email"].alias("e"),
                           pc["phone"].alias("p"), pc["url"].alias("u"),
                           pc["ip"].alias("i")).collect()}
    assert got[1] == (1, 0, 0, 0)
    assert got[2] == (0, 0, 2, 0)
    assert got[3] == (0, 2, 0, 0)
    assert got[4] == (0, 0, 0, 1)
    assert got[5] == (0, 0, 0, 0)
    assert got[6] == (1, 1, 1, 1)


def test_redact_pii_removes_every_match(spark, pii_docs):
    red = pii_docs.select(
        "doc_id", tx.redact_pii(F.col("text")).alias("r")).collect()
    for row in red:
        pc = tx.pii_counts(F.lit(row["r"]))
        left = spark.range(1).select(
            *[v.alias(k) for k, v in pc.items()]).collect()[0]
        assert all(left[k] == 0 for k in ("email", "phone", "url", "ip")), \
            (row["doc_id"], row["r"])
    by_id = {r["doc_id"]: r["r"] for r in red}
    assert "<EMAIL>" in by_id[1]
    assert by_id[2].count("<URL>") == 2
    assert by_id[3].count("<PHONE>") == 2
    assert "<IP>" in by_id[4]
    assert by_id[5] == "nothing sensitive here, just 12345"


# ---------------------------------------------------------- repetition
def test_ngram_repetition_stats(spark):
    from fashion_knowledge_graph_spark.operators import dedup as dd
    rows = [
        (1, "a b a b a b"),          # bigrams: ab ba ab ba ab -> 2/5 distinct
        (2, "one two three four"),   # all 3 bigrams distinct
        (3, "solo"),                 # <2 tokens: no bigrams
        (4, ""),                     # empty
        (5, "x x x x"),              # bigrams: xx xx xx -> 1/3 distinct
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["id"]: r.asDict() for r in
           dd.ngram_repetition_stats(df, n=2).collect()}
    assert (got[1]["n_ngrams"], got[1]["n_distinct"]) == (5, 2)
    assert got[1]["rep_frac"] == pytest.approx(0.6)
    assert (got[2]["n_ngrams"], got[2]["n_distinct"]) == (3, 3)
    assert got[2]["rep_frac"] == 0.0
    assert (got[3]["n_ngrams"], got[3]["n_distinct"],
            got[3]["rep_frac"]) == (0, 0, 0.0)
    assert (got[4]["n_ngrams"], got[4]["n_distinct"],
            got[4]["rep_frac"]) == (0, 0, 0.0)
    assert (got[5]["n_ngrams"], got[5]["n_distinct"]) == (3, 1)
    assert got[5]["rep_frac"] == pytest.approx(2 / 3, abs=1e-6)


# -------------------------------------------------------------- TF-IDF
def test_tfidf_top_terms_matches_reference(spark):
    import math
    from collections import Counter
    rows = [(1, "apple banana apple cherry"),
            (2, "banana cherry cherry date"),
            (3, "apple apple apple egg"),
            (4, "fig")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = [(r["doc_id"], r["term"], r["tf"], r["df_t"], r["tfidf"], r["rnk"])
           for r in tx.tfidf_top_terms(df, k=2).collect()]
    # reference
    docs = {i: t.split() for i, t in rows}
    n = len(docs)
    tf = {i: Counter(t) for i, t in docs.items()}
    dfreq = Counter(term for c in tf.values() for term in c)
    want = []
    for i in sorted(docs):
        scored = sorted(
            ((term, c, dfreq[term],
              c * (math.log((n + 1) / (dfreq[term] + 1)) + 1))
             for term, c in tf[i].items()),
            key=lambda x: (-x[3], x[0]))[:2]
        for rnk, (term, c, d, s) in enumerate(scored, 1):
            want.append((i, term, c, d, round(s, 6), rnk))
    assert sorted(got) == sorted(want)


def test_bm25_matches_python_reference(spark):
    import math
    import re

    from fashion_knowledge_graph_spark.functions.text import bm25_topk

    docs = [(1, "spark join fast spark"), (2, "slow table scan"),
            (3, "join join join fast"), (4, "spark"),
            (5, "nothing relevant here at all")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [(r["doc_id"], r["score"], r["rank"])
           for r in bm25_topk(df, ["spark", "join", "fast"], k=10)
           .orderBy("rank").collect()]

    tok = {i: re.sub(r"[^a-z0-9]+", " ", t.lower()).split()
           for i, t in docs}
    n = len(tok)
    avgdl = sum(len(v) for v in tok.values()) / n
    terms = ["spark", "join", "fast"]
    dfreq = {t: sum(1 for v in tok.values() if t in v) for t in terms}
    scores = {}
    for i, v in tok.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            idf = math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1)
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(v) / avgdl))
        if s > 0:
            scores[i] = round(s, 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == [(i, s, r + 1) for r, (i, s) in enumerate(want)]
    assert 5 not in {g[0] for g in got}     # no query term, no row


def test_char_entropy_matches_python(spark):
    import math

    from fashion_knowledge_graph_spark.functions.text import char_entropy

    rows = [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, None), (5, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_chars"], r["entropy"])
           for r in char_entropy(df).collect()}
    assert 4 not in got                      # null text dropped

    def h(s):
        n = len(s)
        freq = {}
        for c in s:
            freq[c] = freq.get(c, 0) + 1
        return round(-sum(m / n * math.log2(m / n)
                          for m in freq.values()), 6)

    assert got[1] == (4, 0.0)                # constant string
    assert got[2] == (4, 1.0)                # two equiprobable chars
    assert got[3] == (4, h("abcd"))          # uniform: log2(4) = 2
    assert got[3][1] == pytest.approx(2.0)
    assert got[5] == (1, 0.0)


def test_rake_keyphrases_matches_python(spark):
    """RAKE vs a direct python replay: islands split at stopwords,
    deg/freq word scores, phrase = Σ member scores."""
    from fashion_knowledge_graph_spark.functions.text import (
        EN_STOPWORDS, rake_keyphrases,
    )

    rows = [(1, "deep learning of deep learning models"),
            (2, "learning models and deep learning"),
            (3, "the models")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["phrase"]: (r["n_occurrences"], r["score"], r["rank"])
           for r in rake_keyphrases(df, max_phrase_len=4,
                                    top=10).collect()}

    stop = set(EN_STOPWORDS)
    phrases = []                      # (phrase_tokens,) instances
    for _, text in rows:
        run = []
        for t in text.split(" "):
            if t in stop:
                if run:
                    phrases.append(run)
                run = []
            else:
                run.append(t)
        if run:
            phrases.append(run)
    phrases = [p for p in phrases if len(p) <= 4]
    freq, deg = {}, {}
    for p in phrases:
        for t in p:
            freq[t] = freq.get(t, 0) + 1
            deg[t] = deg.get(t, 0) + len(p)
    wscore = {t: deg[t] / freq[t] for t in freq}
    exp = {}
    for p in phrases:
        ph = " ".join(p)
        n, _ = exp.get(ph, (0, None))
        exp[ph] = (n + 1, round(sum(wscore[t] for t in p), 6))
    assert {k: v[:2] for k, v in got.items()} == exp
    # ranking: by rounded score desc, phrase asc — spot-check order
    ordered = sorted(exp.items(), key=lambda kv: (-kv[1][1], kv[0]))
    for i, (ph, _) in enumerate(ordered, start=1):
        assert got[ph][2] == i, (ph, got[ph])
    # multiword content phrases outrank stopword-adjacent singletons
    assert got["deep learning"][2] < got["models"][2]


def test_chunk_documents_windows_and_overlap(spark):
    import pytest as _pytest

    from fashion_knowledge_graph_spark.functions.text import (
        chunk_documents,
    )
    words = " ".join(f"w{i}" for i in range(10))     # 10 tokens
    small = "a b c"
    df = spark.createDataFrame(
        [(1, words), (2, small), (3, None), (4, "")],
        "doc_id long, text string")
    got = {}
    for r in chunk_documents(df, chunk_tokens=4,
                             overlap_tokens=2).collect():
        got.setdefault(r.id, []).append(
            (r.chunk_idx, r.n_tokens, r.chunk_text))
    # doc1: starts 0,2,4,6,8 -> windows of 4 (last clipped to 2 =
    # pure overlap, dropped); every boundary pair shares 2 tokens
    assert got[1] == [(0, 4, "w0 w1 w2 w3"), (1, 4, "w2 w3 w4 w5"),
                      (2, 4, "w4 w5 w6 w7"), (3, 4, "w6 w7 w8 w9")]
    # one-window doc; null/empty produce nothing
    assert got[2] == [(0, 3, "a b c")]
    assert 3 not in got and 4 not in got
    # coverage: every token of doc1 appears in >=1 chunk
    seen = set()
    for _, _, t in got[1]:
        seen.update(t.split())
    assert seen == set(words.split())
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap_tokens=4)
