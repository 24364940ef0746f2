"""Greedy max-coverage vs an exhaustive python greedy replay."""
import pandas as pd

from fashion_knowledge_graph_spark.operators.selection import (
    greedy_max_coverage,
)

DOCS = {
    1: {"a", "b", "c", "d"},
    2: {"c", "d", "e"},
    3: {"e", "f", "g"},
    4: {"a", "b"},        # subset of 1 — never a useful pick
    5: {"h"},
    6: {"f", "g", "h"},   # ties with 3 after pick 1 → lower id wins
}


def _python_greedy(k):
    covered, out = set(), []
    for rank in range(1, k + 1):
        best = max(DOCS, key=lambda d: (len(DOCS[d] - covered), -d))
        gain = len(DOCS[best] - covered)
        if gain == 0:
            break
        covered |= DOCS[best]
        out.append((rank, best, gain, len(covered)))
    return out


def _df(spark):
    rows = [(d, t) for d, toks in DOCS.items() for t in sorted(toks)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "tok"]))


def test_greedy_trace_matches_python(spark):
    got = [(r.rank, r.doc_id, r.new_tokens, r.total_covered)
           for r in greedy_max_coverage(_df(spark), k=4).collect()]
    assert got == _python_greedy(4)
    # first pick is the biggest doc, trace is monotone in coverage
    assert got[0][1] == 1
    totals = [t for *_, t in got]
    assert totals == sorted(set(totals))


def test_greedy_stops_when_everything_is_covered(spark):
    got = greedy_max_coverage(_df(spark), k=10).collect()
    assert got[-1].total_covered == len(set().union(*DOCS.values()))
    assert len(got) < 10  # early exit, no zero-gain padding rows
