"""Pure pandas/numpy reference implementation of the KG semantics.

The reference repo ships no tests (SURVEY §5.1), so this module IS the
oracle: a row-at-a-time, brute-force implementation of exactly the
semantics in SURVEY §2 — same thresholds, same top-1-then-threshold
gate (W5), same pair/rel-type/weight rules — against which the
distributed Spark pipeline is compared (target P/R ≥ 0.95; with the
deterministic model stand-ins the match is exact).

Deliberately naive: brute-force cosine instead of LSH, Python loops
instead of joins. Mirrors the *reference's* execution style
(src/engine/process_social_media_images.py iterates rows), which is
the point — it is independent of every Spark code path it checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import taxonomy as tx
from .datagen import base_attrs, content_embed
from .functions import hashing as hx
from .operators.attributes import _MULTI_PREDS, _SCALAR_PREDS


def explode_spans(docs: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for r in docs.itertuples():
        for idx, s in enumerate(r.spans):
            rows.append((r.doc_id, idx, s["kind"], s["text"],
                         s["media_ref"], s["offset"]))
    return pd.DataFrame(
        rows, columns=["doc_id", "span_idx", "kind", "text",
                       "media_ref", "offset"])


def image_mentions(docs: pd.DataFrame) -> pd.DataFrame:
    spans = explode_spans(docs)
    spans = spans[(spans["kind"] == "image_ref")
                  & spans["media_ref"].notna()].reset_index(drop=True)
    refs = spans["media_ref"].to_numpy()
    labels, areas = hx.segment_labels_areas(refs)
    spans["label"], spans["area"] = labels, areas
    spans = spans[(spans["label"] != "Background")
                  & (spans["area"] >= tx.MIN_AREA)].reset_index(drop=True)
    attrs = base_attrs(spans["media_ref"].to_numpy())
    for k, v in attrs.items():
        spans[k] = list(v)
    spans = spans[spans["type"].notna()].reset_index(drop=True)
    vecs = content_embed(spans["media_ref"].to_numpy())
    spans["embedding"] = list(vecs)
    return spans


def link(mentions: pd.DataFrame, catalog: pd.DataFrame,
         top_k: int = tx.LINK_TOP_K,
         threshold: float = tx.LINK_THRESHOLD) -> pd.DataFrame:
    """Brute-force per-mention linking with metadata filters + W5 gate."""
    cat_vecs = np.stack(catalog["embedding"].to_numpy()).astype(np.float64)
    out = []
    for m in mentions.itertuples():
        mask = ((catalog["type"] == m.type)
                & (catalog["color"] == m.color)
                & (catalog["gender"].isin(["unisex", m.gender]))).to_numpy()
        if not mask.any():
            continue
        scores = cat_vecs[mask] @ np.asarray(m.embedding, dtype=np.float64)
        sub = catalog[mask].reset_index(drop=True)
        order = sorted(range(len(sub)),
                       key=lambda i: (-scores[i], sub["product_id"].iat[i]))
        top = order[:top_k]
        first = top[0]
        if scores[first] >= threshold:
            out.append((m.doc_id, m.span_idx,
                        sub["product_id"].iat[first],
                        sub["category"].iat[first],
                        float(scores[first])))
    return pd.DataFrame(
        out, columns=["doc_id", "span_idx", "product_id", "category", "score"])


def attr_triples(linked: pd.DataFrame, mentions: pd.DataFrame) -> pd.DataFrame:
    m = linked.merge(
        mentions[["doc_id", "span_idx"]
                 + list(tx.SCALAR_ATTRS) + list(tx.MULTI_ATTRS)],
        on=["doc_id", "span_idx"])
    rows = []
    for r in m.itertuples():
        for attr, pred in _SCALAR_PREDS:
            v = getattr(r, attr)
            if v is not None:
                rows.append((r.product_id, pred, v, r.doc_id, r.span_idx,
                             r.score))
        for attr, pred in _MULTI_PREDS:
            for v in getattr(r, attr) or []:
                rows.append((r.product_id, pred, v, r.doc_id, r.span_idx,
                             r.score))
    return pd.DataFrame(
        rows, columns=["subj", "pred", "obj", "doc_id", "span_idx", "score"])


def lexicon_triples(docs: pd.DataFrame) -> pd.DataFrame:
    """Text spans → (doc_id, pred, value) via token/bigram lexicon."""
    import re

    lex = {}
    for attr, values in tx.LEXICON_PREDS.items():
        pred = tx.PREDICATES[attr]
        for v in values:
            lex[v] = (pred, v)
            if "-" in v:
                lex[v.replace("-", " ")] = (pred, v)
    spans = explode_spans(docs)
    spans = spans[(spans["kind"] == "text") & spans["text"].notna()]
    seen = set()
    for r in spans.itertuples():
        toks = [t for t in re.split(r"[^a-z0-9\-]+", r.text.lower()) if t]
        grams = toks + [" ".join(p) for p in zip(toks, toks[1:])]
        for g in grams:
            if g in lex:
                pred, v = lex[g]
                seen.add((r.doc_id, pred, v))
    return pd.DataFrame(sorted(seen), columns=["subj", "pred", "obj"])


def pairs_and_edges(linked: pd.DataFrame,
                    catalog: pd.DataFrame) -> tuple[pd.DataFrame, pd.DataFrame]:
    """i<j position pairs per doc → canonical-direction edge table."""
    import hashlib

    cat_map = catalog.set_index("product_id")["category"].to_dict()

    def channel(doc_id: str) -> str:
        # mirrors operators/edges.cooccurrence_pairs: md5 split
        return ("social_media"
                if hashlib.md5(str(doc_id).encode()).hexdigest()[0] < "8"
                else "web_crawl")

    obs = []
    for doc_id, grp in linked.sort_values(
            ["doc_id", "span_idx"]).groupby("doc_id", sort=True):
        ids = grp["product_id"].tolist()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                c1, c2 = cat_map.get(ids[i]), cat_map.get(ids[j])
                rel = ("COMPLEMENTED_BY"
                       if c1 is not None and c2 is not None and c1 == c2
                       else "WORN_WITH")
                src, dst = sorted([ids[i], ids[j]])
                obs.append((src, dst, rel, doc_id, channel(doc_id)))
    pairs = pd.DataFrame(
        obs, columns=["src", "dst", "rel_type", "image", "source"])
    if pairs.empty:
        edges = pd.DataFrame(
            columns=["src", "dst", "rel_type", "weight", "images",
                     "source", "last_image"])
        return pairs, edges
    # last-write-wins source = source of the max-image observation
    # (sort by image, take last) — matches max_by(source, image)
    edges = pairs.sort_values("image", kind="stable").groupby(
        ["src", "dst", "rel_type"], as_index=False).agg(
        weight=("image", "size"),
        images=("image", lambda s: sorted(s)),
        source=("source", "last"),
        last_image=("image", "max"))
    return pairs, edges


def connected_components(catalog: pd.DataFrame,
                         threshold: float = 0.98) -> dict[str, str]:
    """Brute-force O(n²) near-dup detection + union-find."""
    ids = catalog["product_id"].tolist()
    vecs = np.stack(catalog["embedding"].to_numpy()).astype(np.float64)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted([ra, rb])
            parent[hi] = lo

    sims = vecs @ vecs.T
    n = len(ids)
    tcol = catalog["type"].to_numpy()
    ccol = catalog["color"].to_numpy()
    for i in range(n):
        for j in range(i + 1, n):
            if (sims[i, j] >= threshold and tcol[i] == tcol[j]
                    and ccol[i] == ccol[j]):
                union(ids[i], ids[j])
    return {i: find(i) for i in ids}


def full_pipeline(docs: pd.DataFrame, catalog: pd.DataFrame) -> dict:
    """End-to-end oracle: returns every intermediate + final table."""
    mentions = image_mentions(docs)
    linked = link(mentions, catalog)
    triples_attr = attr_triples(linked, mentions)
    triples_text = lexicon_triples(docs)
    pairs, edges = pairs_and_edges(linked, catalog)
    canon = connected_components(catalog)
    for c in ("subj",):
        triples_attr[c] = triples_attr[c].map(lambda x: canon.get(x, x))
    edges_canon = edges.copy()
    if len(edges_canon):
        edges_canon["src"] = edges_canon["src"].map(lambda x: canon.get(x, x))
        edges_canon["dst"] = edges_canon["dst"].map(lambda x: canon.get(x, x))
        lo = edges_canon[["src", "dst"]].min(axis=1)
        hi = edges_canon[["src", "dst"]].max(axis=1)
        edges_canon["src"], edges_canon["dst"] = lo, hi
        # two-level last-write-wins: merged edge's source = source of
        # the sub-edge whose last observation (max image) is globally
        # latest — equals single-level max_by(source, image)
        edges_canon = edges_canon.sort_values(
            "last_image", kind="stable").groupby(
            ["src", "dst", "rel_type"], as_index=False).agg(
            weight=("weight", "sum"),
            images=("images", lambda s: sorted(x for lst in s for x in lst)),
            source=("source", "last"))
    return {"mentions": mentions, "linked": linked,
            "triples_attr": triples_attr, "triples_text": triples_text,
            "pairs": pairs, "edges": edges, "edges_canon": edges_canon,
            "canon": canon}
