"""Property-based tests (hypothesis) for the pure-Python kernels and
Catalyst text expressions — invariants that hold for ARBITRARY input,
not just the seeded fixtures."""

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fashion_knowledge_graph_spark.functions import hashing as hx

TEXTS = st.text(alphabet=st.characters(codec="utf-8",
                                       exclude_characters="\x00"),
                max_size=200)


@settings(max_examples=200, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=50))
def test_hash64_deterministic_and_batch_independent(keys):
    """Same string → same hash, regardless of batch composition
    (padding width must not leak into the value)."""
    h1 = hx.hash64(keys)
    h2 = hx.hash64(keys)
    assert (h1 == h2).all()
    # hash each string alone — must equal its in-batch hash
    solo = np.array([hx.hash64([k])[0] for k in keys], dtype=np.uint64)
    assert (h1 == solo).all()
    # appending an unrelated long string must not change earlier hashes
    h3 = hx.hash64(list(keys) + ["x" * 500])
    assert (h3[:len(keys)] == h1).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=20),
       st.integers(min_value=1, max_value=64),
       st.integers(min_value=0, max_value=100))
def test_rand_uniform_range_and_determinism(keys, ncols, lane):
    h = hx.hash64(keys)
    u = hx.rand_uniform(h, ncols, lane=lane)
    assert u.shape == (len(keys), ncols)
    assert ((u >= 0.0) & (u < 1.0)).all()
    assert (u == hx.rand_uniform(h, ncols, lane=lane)).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(TEXTS.filter(lambda s: s.strip() != ""),
                min_size=1, max_size=10))
def test_embeddings_unit_norm(keys):
    v = hx.embed_strings(keys, 64)
    norms = np.linalg.norm(v, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-5)
    # determinism
    v2 = hx.embed_strings(keys, 64)
    assert (v == v2).all()


@settings(max_examples=100, deadline=None)
@given(TEXTS)
def test_attrs_closed_vocabulary(text):
    from fashion_knowledge_graph_spark import taxonomy as tx

    a = hx.attrs_from_refs([text])
    assert a["type"][0] in tx.TYPES
    assert a["color"][0] in tx.COLORS
    for v in a["material"][0]:
        assert v in tx.MATERIALS
    assert 1 <= len(a["style"][0]) <= 2


def _py_norm(s):
    return re.sub(r"[^a-z0-9]+", " ", s.lower()).strip()


@settings(max_examples=100, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=8))
def test_shingle_set_properties(texts):
    """Shingle sets: distinct, each shingle is 3 consecutive tokens
    (or the whole short doc)."""
    for t in texts:
        toks = [x for x in _py_norm(t).split(" ") if x]
        if len(toks) >= 3:
            exp = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        elif toks:
            exp = {" ".join(toks)}
        else:
            exp = set()
        # python-side mirror of text.shingles — the Spark parity is
        # covered in test_text.py; here we check the invariant shape
        assert all(1 <= len(s.split(" ")) <= 3 for s in exp)
        assert len(exp) == len(set(exp))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, width=32),
                min_size=0, max_size=64))
def test_int8_quantization_error_bound_and_range(vec):
    """For ANY float32 vector: codes stay in [-127, 127] and the
    reconstruction error of every element is bounded by half a
    quantization step (scale/127/2), the information-theoretic floor
    for round-to-nearest — mirrors operators/quantize.py's kernel
    arithmetic exactly."""
    v = np.asarray(vec, dtype=np.float64)
    if v.size == 0:
        return
    scale = float(np.max(np.abs(v)))
    if scale == 0.0:
        q = np.zeros(v.size)
    else:
        q = np.floor(v * 127.0 / scale + 0.5)
    assert q.min() >= -127 and q.max() <= 127
    recon = q * scale / 127.0
    err = np.abs(recon - v)
    # half-step bound with a float-arithmetic epsilon
    assert (err <= scale / 127.0 / 2.0 + 1e-9 * max(scale, 1.0)).all()


@given(st.floats(min_value=0.5, max_value=0.999),
       st.floats(min_value=0.9, max_value=0.9999))
@settings(max_examples=60, deadline=None)
def test_lsh_params_meet_recall_target(threshold, target):
    from fashion_knowledge_graph_spark.functions.embeddings import (
        banding_recall,
        lsh_params_for,
    )

    nbits, nbands = lsh_params_for(threshold, target)
    assert nbits % nbands == 0 and nbits <= 4096
    b = nbits // nbands
    assert banding_recall(threshold, b, nbands) >= target
    # one band fewer must MISS the target (k was minimal for this b)
    if nbands > 1:
        assert banding_recall(threshold, b, nbands - 1) < target


def test_banding_recall_matches_repo_constants():
    """The numbers the operator docstrings cite: 16×16 at the 0.98
    dup threshold ≈ 0.999; 8×8 (near_duplicate_pairs defaults) even
    higher."""
    from fashion_knowledge_graph_spark.functions.embeddings import (
        banding_recall,
    )

    assert banding_recall(0.98, 16, 16) > 0.995
    assert banding_recall(0.98, 8, 8) > 0.999
    # recall is monotone in the cosine threshold
    assert banding_recall(0.99, 16, 16) > banding_recall(0.97, 16, 16)
