"""Distributed BPE learner vs a pure-Python sequential reference."""
import re
from collections import Counter

from fashion_knowledge_graph_spark.operators import tokenizer as tk

CORPUS = [
    (1, "the cat sat on the mat and the hat"),
    (2, "lower lowest low slower slowest"),
    (3, "newer newest new widest wider wide"),
    (4, "the newest hat is the widest hat"),
]


def _py_word_freqs(rows):
    c = Counter()
    for _, text in rows:
        norm = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
        for w in norm.split(" "):
            if w:
                c[w] += 1
    return c


def _py_pair_counts(vocab):
    pc = Counter()
    for syms, freq in vocab:
        for i in range(len(syms) - 1):
            pc[(syms[i], syms[i + 1])] += freq
    return pc


def _py_merge(syms, a, b):
    out = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _py_learn_bpe(rows, n_merges):
    wf = _py_word_freqs(rows)
    vocab = [(list(w), f) for w, f in wf.items()]
    merges = []
    for _ in range(n_merges):
        pc = _py_pair_counts(vocab)
        if not pc:
            break
        # count desc, pair asc — same tiebreak as the Spark learner
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, c))
        vocab = [(_py_merge(s, a, b), f) for s, f in vocab]
    return merges, vocab


def test_learn_bpe_matches_sequential_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = tk.learn_bpe(docs, 8)
    want, _ = _py_learn_bpe(CORPUS, 8)
    assert got == want


def test_char_pair_counts_match_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {(r["a"], r["b"]): r["pair_count"]
           for r in tk.char_pair_counts(docs, k=10).collect()}
    wf = _py_word_freqs(CORPUS)
    ref = _py_pair_counts([(list(w), f) for w, f in wf.items()])
    top = dict(sorted(ref.items(),
                      key=lambda kv: (-kv[1], kv[0]))[:10])
    assert got == {k: v for k, v in top.items()}


def test_apply_merges_tokenizes_new_words(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = tk.learn_bpe(docs, 8)
    vocab = spark.createDataFrame(
        [(["s", "l", "o", "w", "e", "s", "t"], 1)],
        "syms array<string>, freq long")
    out = tk.apply_merges(vocab, merges).first()["syms"]
    ref_syms = ["s", "l", "o", "w", "e", "s", "t"]
    for a, b, _ in merges:
        ref_syms = _py_merge(ref_syms, a, b)
    assert out == ref_syms
