"""q-gram-blocked fuzzy entity resolution vs a brute-force pandas oracle."""
import pandas as pd
from pyspark.sql import functions as F

from fashion_knowledge_graph_spark.operators.er import (
    fuzzy_join, fuzzy_top1, qgram_explode, stop_grams,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


NAMES = ["black cotton shirt", "blue cotton shirt", "black wool coat",
         "red silk scarf", "red silk skirt", "green linen pants"]
MENTIONS = [  # (id, dirty surface form)
    (1, "black cotton shirt"),    # exact
    (2, "blck cotton shirt"),     # 1 deletion
    (3, "red silk scrf"),         # 1 deletion, 2 close catalog names
    (4, "geen linen pants"),      # 1 deletion
    (5, "purple velvet hat"),     # no match within distance 2
]


def _frames(spark):
    men = spark.createDataFrame(
        pd.DataFrame(MENTIONS, columns=["mid", "mtext"]))
    cat = spark.createDataFrame(
        pd.DataFrame({"cid": [f"c{i}" for i in range(len(NAMES))],
                      "cname": NAMES}))
    return men, cat


def test_qgram_explode_distinct_grams(spark):
    df = spark.createDataFrame(pd.DataFrame({"i": [1], "t": ["aaaa"]}))
    grams = {r.gram for r in qgram_explode(df, "i", "t").collect()}
    assert grams == {"aaa"}  # distinct within a row
    short = spark.createDataFrame(pd.DataFrame({"i": [1], "t": ["ab"]}))
    assert [r.gram for r in qgram_explode(short, "i", "t").collect()] \
        == ["ab"]  # shorter than q still blockable


def test_fuzzy_join_matches_bruteforce(spark):
    men, cat = _frames(spark)
    got = {(r.mid, r.cname, r.distance)
           for r in fuzzy_join(men, cat, "mid", "mtext",
                               "cid", "cname",
                               max_distance=2).collect()}
    want = set()
    for mid, mtext in MENTIONS:
        mg = {mtext[i:i + 3] for i in range(max(len(mtext) - 2, 1))}
        for cname in NAMES:
            cg = {cname[i:i + 3] for i in range(max(len(cname) - 2, 1))}
            d = _lev(mtext, cname)
            if mg & cg and d <= 2:
                want.add((mid, cname, d))
    assert got == want
    assert not any(r[0] == 5 for r in got)  # no-match row dropped


def test_fuzzy_top1_deterministic_tiebreak(spark):
    men, cat = _frames(spark)
    rows = {r.mid: (r.cname, r.distance)
            for r in fuzzy_top1(men, cat, "mid", "mtext",
                                "cid", "cname",
                                max_distance=2).collect()}
    assert rows[1] == ("black cotton shirt", 0)
    assert rows[2] == ("black cotton shirt", 1)
    # "red silk scrf" is distance 1 from scarf, 2 from skirt → scarf;
    # equal-distance ties would break on cname ascending
    assert rows[3] == ("red silk scarf", 1)
    assert 5 not in rows


def test_stop_gram_pruning_drops_head_gram_pairs(spark):
    men, cat = _frames(spark)
    rg = qgram_explode(cat, "cid", "cname")
    stops = {r.gram for r in stop_grams(rg, max_gram_df=2).collect()}
    assert stops  # shared grams like 'lk ' / 'si' family exceed df 2
    pruned = fuzzy_join(men, cat, "mid", "mtext", "cid", "cname",
                        max_distance=2, max_gram_df=2)
    full = fuzzy_join(men, cat, "mid", "mtext", "cid", "cname",
                      max_distance=2)
    # pruning only ever removes candidates, never invents them
    got_p = {(r.mid, r.cname) for r in pruned.collect()}
    got_f = {(r.mid, r.cname) for r in full.collect()}
    assert got_p <= got_f


def test_fuzzy_join_plan_is_equi_join_not_cross(spark):
    men, cat = _frames(spark)
    plan = fuzzy_join(men, cat, "mid", "mtext", "cid", "cname")._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_snm_pairs_window_and_determinism(spark):
    from fashion_knowledge_graph_spark.operators.er import snm_pairs

    rows = [(1, "alpha"), (2, "alphb"), (3, "beta"), (4, "betb"),
            (5, "gamma"), (6, None)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r.id_a, r.id_b) for r in
           snm_pairs(df, "id", "name", window=2).collect()}
    # sort order: alpha(1) alphb(2) beta(3) betb(4) gamma(5); w=2 ->
    # adjacent pairs only; null key dropped
    assert got == {(1, 2), (2, 3), (3, 4), (4, 5)}
    # window=3 adds the rank-distance-2 pairs
    got3 = {(r.id_a, r.id_b) for r in
            snm_pairs(df, "id", "name", window=3).collect()}
    assert got3 == got | {(1, 3), (2, 4), (3, 5)}
    # candidate bound: n*(w-1) - sum of trailing panes
    assert len(got3) == 7
    # verify stage: levenshtein <= 1 keeps only the true near-pairs
    verified = {(r.id_a, r.id_b): r.distance for r in
                snm_pairs(df, "id", "name", window=3,
                          max_distance=1).collect()}
    assert verified == {(1, 2): 1, (3, 4): 1}
    # equal keys: id tiebreak keeps the pane deterministic
    dup = spark.createDataFrame(
        [(7, "same"), (8, "same"), (9, "same")], "id long, name string")
    gd = {(r.id_a, r.id_b) for r in
          snm_pairs(dup, "id", "name", window=2).collect()}
    assert gd == {(7, 8), (8, 9)}


def test_fs_em_step_matches_python_replay(spark):
    """One EM iteration over a hand-built comparison-vector table,
    replayed in pure python."""
    from fashion_knowledge_graph_spark.operators.er import (
        fs_em_step, fs_score,
    )
    rows = [(1, 1, 1), (1, 1, 0), (1, 0, 1), (0, 0, 0),
            (0, 1, 0), (0, 0, 1), (1, 1, 1), (0, 0, 0)]
    df = spark.createDataFrame(rows, "g1 int, g2 int, g3 int")
    got = fs_em_step(df, ["g1", "g2", "g3"])

    pi0, m0, u0 = 0.1, 0.9, 0.1
    ps = []
    for g in rows:
        pm, pu = pi0, 1 - pi0
        for gi in g:
            pm *= m0 if gi == 1 else 1 - m0
            pu *= u0 if gi == 1 else 1 - u0
        ps.append(pm / (pm + pu))
    sp = sum(ps)
    n = len(rows)
    want = {
        "pi": sp / n,
        "m": {f"g{i+1}": sum(p * g[i] for p, g in zip(ps, rows)) / sp
              for i in range(3)},
        "u": {f"g{i+1}": sum((1 - p) * g[i]
                             for p, g in zip(ps, rows)) / (n - sp)
              for i in range(3)},
    }
    assert abs(got["pi"] - want["pi"]) < 1e-12
    for i in ("g1", "g2", "g3"):
        assert abs(got["m"][i] - want["m"][i]) < 1e-12
        assert abs(got["u"][i] - want["u"][i]) < 1e-12
    # learned weights separate all-agree pairs from all-disagree pairs
    w = fs_score(df, got, ["g1", "g2", "g3"])
    scored = {tuple(r[:3]): r[3] for r in
              df.select("g1", "g2", "g3", w.alias("w")).collect()}
    assert scored[(1, 1, 1)] > scored[(0, 0, 0)]


def test_blocking_metrics_hand_computed(spark):
    from fashion_knowledge_graph_spark.operators.er import (
        blocking_metrics,
    )
    # two blocks: {1,2,3} (en) and {4,5} (fr); doc 6 has a NULL key
    docs = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "en"), (4, "fr"), (5, "fr"),
         (6, None)],
        "doc_id long, lang string")
    # true matches: (1,2) inside a block, (3,4) across blocks
    truth = spark.createDataFrame([(1, 2), (3, 4)],
                                  "id_a long, id_b long")
    row = blocking_metrics(docs, truth, ["lang"]).collect()[0]
    # candidates: C(3,2)+C(2,2)=3+1=4 over n=5 keyed docs (10 pairs)
    assert row.n_docs == 5 and row.n_candidates == 4
    assert row.n_true == 2 and row.n_matched == 1
    assert row.pairs_completeness == 0.5
    assert row.reduction_ratio == 0.6


def test_blocking_metrics_composite_key_and_empty_truth(spark):
    from fashion_knowledge_graph_spark.operators.er import (
        blocking_metrics,
    )
    docs = spark.createDataFrame(
        [(1, "en", "web"), (2, "en", "web"), (3, "en", "book")],
        "doc_id long, lang string, source string")
    truth = spark.createDataFrame([], "id_a long, id_b long")
    row = blocking_metrics(docs, truth, ["lang", "source"]).collect()[0]
    assert row.n_candidates == 1 and row.n_true == 0
    assert row.pairs_completeness == 1.0  # vacuous recall
