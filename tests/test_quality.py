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
