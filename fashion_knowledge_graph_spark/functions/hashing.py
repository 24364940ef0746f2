"""Deterministic hash-derived embeddings and attribute records.

Stand-ins for the reference's neural models so the pipeline is
testable with no GPU / network, while keeping the Spark-side plumbing
(Arrow batches, schemas, partitioning) production-shaped:

- CLIP image/text embeddings, 512-d L2-normalized
  (reference: src/models/embedding_model.py:80-197, normalize=True at
  148-151/187-191)  → ``embed_strings(keys, 512)``
- MiniLM sentence embeddings, 384-d
  (reference: src/models/embedding_model.py:233-291) → ``embed_strings(keys, 384)``
- GPT-4o closed-vocabulary attribute extraction
  (reference: src/models/attribute_extraction_model.py:47-114,
  vocabulary src/utils/prompts.py:4-13) → ``attrs_from_refs(keys)``

Everything here is plain numpy so the *same* code runs inside Spark
pandas UDFs, inside the pure-pandas test oracle, and inside datagen —
guaranteeing bit-identical agreement between pipeline and oracle.

Design note (scale): ``hash64`` is a per-string blake2b (fast, stable
across processes — Python's builtin ``hash`` is salted and unusable);
the embedding expansion is fully vectorized splitmix64 → uniform
floats → L2 normalize. Swapping in a real model is a one-function
change (the pandas-UDF signature in functions/embeddings.py is the
contract).
"""

from __future__ import annotations

import hashlib

import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def hash64(keys) -> np.ndarray:
    """Stable 64-bit hash per string (uint64 ndarray)."""
    out = np.empty(len(keys), dtype=np.uint64)
    for i, k in enumerate(keys):
        d = hashlib.blake2b(str(k).encode("utf-8"), digest_size=8).digest()
        out[i] = int.from_bytes(d, "little")
    return out


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain algorithm)."""
    with np.errstate(over="ignore"):
        z = (x + _GOLDEN).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def rand_uniform(h: np.ndarray, ncols: int, lane: int = 0) -> np.ndarray:
    """(len(h), ncols) deterministic uniforms in [0,1) from uint64 seeds."""
    n = len(h)
    out = np.empty((n, ncols), dtype=np.float64)
    with np.errstate(over="ignore"):
        base = h + np.uint64(lane) * np.uint64(0xD1B54A32D192ED03)
        for j in range(ncols):
            z = _splitmix64(base + np.uint64(j) * _GOLDEN)
            out[:, j] = z.astype(np.float64) / 18446744073709551616.0
    return out


def embed_hashes(h: np.ndarray, dim: int) -> np.ndarray:
    """uint64 seeds → (n, dim) float32 L2-normalized embeddings.

    cosine ≡ dot afterwards (reference normalizes too:
    src/models/embedding_model.py:148-151).
    """
    u = rand_uniform(h, dim, lane=1)
    v = (u * 2.0 - 1.0).astype(np.float32)
    norms = np.linalg.norm(v, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return v / norms


def embed_strings(keys, dim: int) -> np.ndarray:
    return embed_hashes(hash64(keys), dim)


def perturb(vecs: np.ndarray, h: np.ndarray, eps: float) -> np.ndarray:
    """Deterministic small perturbation + renormalize — used by datagen
    to create near-duplicate entities for the canonicalization tests."""
    noise = (rand_uniform(h, vecs.shape[1], lane=7) * 2.0 - 1.0) * eps
    v = (vecs + noise.astype(np.float32)).astype(np.float32)
    norms = np.linalg.norm(v, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return v / norms


def pick(h: np.ndarray, options: list, lane: int) -> np.ndarray:
    """Deterministic uniform pick from ``options`` per seed."""
    u = rand_uniform(h, 1, lane=lane)[:, 0]
    idx = np.minimum((u * len(options)).astype(np.int64), len(options) - 1)
    return np.asarray(options, dtype=object)[idx]


def pick_zipf(h: np.ndarray, options: list, lane: int, s: float = 1.2) -> np.ndarray:
    """Zipf-skewed pick: head values ('black', 'cotton') dominate —
    exercises the salted-join skew path (FIXTURES.md §1)."""
    ranks = np.arange(1, len(options) + 1, dtype=np.float64)
    w = 1.0 / ranks**s
    cdf = np.cumsum(w / w.sum())
    u = rand_uniform(h, 1, lane=lane)[:, 0]
    idx = np.searchsorted(cdf, u, side="right")
    idx = np.minimum(idx, len(options) - 1)
    return np.asarray(options, dtype=object)[idx]


def pick_multi(h: np.ndarray, options: list, lane: int,
               zipf: bool = False) -> list[list]:
    """1–2 distinct deterministic picks per seed (multi-valued attrs)."""
    first = pick_zipf(h, options, lane) if zipf else pick(h, options, lane)
    second = pick(h, options, lane + 100)
    two = rand_uniform(h, 1, lane=lane + 200)[:, 0] < 0.5
    out = []
    for i in range(len(h)):
        vals = [first[i]]
        if two[i] and second[i] != first[i]:
            vals.append(second[i])
        out.append(vals)
    return out


def attrs_from_refs(keys) -> dict[str, np.ndarray | list]:
    """Deterministic closed-vocabulary attribute record per media_ref.

    Stand-in for GPT-4o attribute extraction
    (src/models/attribute_extraction_model.py:47-114). Same media_ref
    ⇒ same attributes everywhere (datagen, oracle, Spark UDF).
    color/material are Zipf-skewed to create hot keys.
    """
    from .. import taxonomy as tx

    h = hash64(keys)
    return {
        "type": pick(h, tx.TYPES, lane=11),
        "color": pick_zipf(h, tx.COLORS, lane=12),
        "style": pick_multi(h, tx.STYLES, lane=13),
        "season": pick_multi(h, tx.SEASONS, lane=14),
        "occasion": pick_multi(h, tx.OCCASIONS, lane=15),
        "price": pick(h, tx.PRICES, lane=16),
        "material": pick_multi(h, tx.MATERIALS, lane=17, zipf=True),
        "fit": pick(h, tx.FITS, lane=18),
        "gender": pick(h, tx.GENDERS, lane=19),
        "age_group": pick(h, tx.AGE_GROUPS, lane=20),
    }


def segment_labels_areas(keys) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (label, area) per media_ref — stand-in for the
    SegFormer mention detector (src/models/segmentation_model.py:83-129;
    area computed at src/engine/image_processor.py:116-117).

    ~5%% Background, ~10%% area below the MIN_AREA=1028 gate, so the
    P5/P6 filters (SURVEY §2.B) have real work to do.
    """
    from .. import taxonomy as tx

    h = hash64(keys)
    u_bg = rand_uniform(h, 1, lane=31)[:, 0]
    labels = pick(h, tx.SEGMENT_LABELS[1:], lane=32)
    labels = np.where(u_bg < 0.05, "Background", labels)
    u_area = rand_uniform(h, 1, lane=33)[:, 0]
    # 10% small segments in [0, 1028), rest in [1028, 200000)
    small = (u_area * 10.0) < 1.0
    area = np.where(
        small,
        (rand_uniform(h, 1, lane=34)[:, 0] * tx.MIN_AREA),
        tx.MIN_AREA + rand_uniform(h, 1, lane=35)[:, 0] * (200000 - tx.MIN_AREA),
    ).astype(np.int64)
    return labels, area
