import pytest
from pyspark.sql import functions as F  # noqa: F401

from fashion_knowledge_graph_spark.operators.quality import quality_gate


def test_quality_gate_every_verdict_and_first_rule_wins(spark):
    en = ("the quick brown fox jumps over the lazy dog and then "
          "walks away with many other small animal friends today "
          "because it is a nice day for all of them")           # 33 toks
    rows = [
        (1, en),                                                # pass
        (2, "too short"),                                       # too_short
        (3, " ".join(["spam ham"] * 40)),                       # repetitive
        (4, "der hund die katze das haus und garten ist gross "
            "nicht klein ein baum mit blumen auf wiese für "
            "kinder von eltern zu schule"),                     # lang (de)
        (5, en + " write to me at a@b.io thanks"),              # pii
        (6, " ".join(f"w{i}" for i in range(100))),             # too_long
        (7, None),                                              # too_short
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in quality_gate(
        df, min_tokens=5, max_tokens=90, max_rep_frac=0.5,
        allowed_langs=("en",), max_pii=0).collect()}

    assert out[1]["verdict"] == "pass"
    assert out[2]["verdict"] == "too_short"
    assert out[3]["verdict"] == "repetitive" and out[3]["rep_frac"] > 0.5
    assert out[4]["verdict"] == "lang" and out[4]["lang_pred"] == "de"
    assert out[5]["verdict"] == "pii" and out[5]["pii_total"] == 1
    assert out[6]["verdict"] == "too_long"
    assert out[7]["verdict"] == "too_short" and out[7]["n_tokens"] == 0

    # first-rule-wins: a doc that is BOTH too short and non-English
    # must report too_short (fixed rule order keeps counts additive)
    both = spark.createDataFrame([(9, "der zug")], "doc_id long, text string")
    r = quality_gate(both, min_tokens=5,
                     allowed_langs=("en",)).collect()[0]
    assert r["verdict"] == "too_short"


def test_quality_gate_signal_values_match_components(spark):
    from fashion_knowledge_graph_spark.functions import text as tx
    from fashion_knowledge_graph_spark.operators.dedup import (
        ngram_repetition_stats,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta alpha beta alpha"), (2, "one two three")],
        "doc_id long, text string")
    out = {r["id"]: r for r in quality_gate(df).collect()}
    lang = {r["doc_id"]: r["lang_pred"] for r in tx.lang_id(df).collect()}
    rep = {r["id"]: r["rep_frac"]
           for r in ngram_repetition_stats(df).collect()}
    for i in (1, 2):
        assert out[i]["lang_pred"] == lang[i]
        assert out[i]["rep_frac"] == rep[i]


def test_bigram_lm_score_matches_python(spark):
    """Stupid-backoff bigram LM vs a direct python replay: model from
    a 3-doc subset, scored docs include unseen bigrams AND unseen
    unigrams so both branches (and the c_w2=0 backoff corner) run."""
    import math
    import re

    from fashion_knowledge_graph_spark.operators.quality import (
        bigram_lm_score,
    )

    model_rows = [(0, "red cotton dress with red trim"),
                  (1, "blue denim jacket with zip"),
                  (2, "red cotton shirt")]
    score_rows = model_rows + [
        (3, "red cotton dress"),            # all bigrams seen
        (4, "green velvet gown tonight"),   # all unigrams unseen
        (5, "dress with blue cotton"),      # seen words, unseen bigrams
        (6, "single"),                      # <2 tokens → absent
        (7, None)]                          # NULL → absent
    docs = spark.createDataFrame(score_rows, "doc_id long, text string")
    model = spark.createDataFrame(model_rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["mean_logp"])
           for r in bigram_lm_score(docs, model).collect()}

    def toks(s):
        return [t for t in re.sub(r"[^a-z0-9]+", " ", s.lower()).split()
                if t]

    uc, bc = {}, {}
    for _, s in model_rows:
        tk = toks(s)
        for w in tk:
            uc[w] = uc.get(w, 0) + 1
        for a, b in zip(tk, tk[1:]):
            bc[(a, b)] = bc.get((a, b), 0) + 1
    n_tok, vocab = sum(uc.values()), len(uc)
    exp = {}
    for i, s in score_rows:
        if s is None:
            continue
        tk = toks(s)
        if len(tk) < 2:
            continue
        lps = []
        for a, b in zip(tk, tk[1:]):
            if (a, b) in bc:
                lps.append(math.log(bc[(a, b)] / uc[a]))
            else:
                lps.append(math.log(
                    0.4 * (uc.get(b, 0) + 1) / (n_tok + vocab)))
        exp[i] = (len(lps), round(sum(lps) / len(lps), 6))
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert got[k][1] == pytest.approx(exp[k][1], abs=1e-6)
    # sanity: the in-model doc scores higher than the OOV doc
    assert got[3][1] > got[4][1]
