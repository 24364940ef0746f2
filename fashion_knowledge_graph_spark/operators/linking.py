"""Entity linking: LSH-blocked cosine top-k join of mentions against
the catalog (or taxonomy) embedding space.

Reproduces the reference's Pinecone query semantics
(src/database/vector_database.py:127-191 called from
src/engine/process_social_media_images.py:78-99):

- metadata filters: ``type`` equality, ``gender IN ('unisex', g)``,
  ``color`` equality (process_social_media_images.py:78-82)
- cosine metric over L2-normalized vectors (setup_pinecone.py:37)
- top_k=5, then **only the first match** is threshold-checked at
  ``score >= 0.7`` (W5 in SURVEY §2.E: top-1-then-threshold, NOT
  threshold-then-top-1 — both implementations preserve this order)

Two physical strategies, same semantics:

- ``link_exact``  — broadcast the catalog, exact cosine against every
  filter-compatible row. Correct at any recall; right choice while
  the dim fits in memory (reference catalog: 3,127 rows). Used as the
  in-Spark oracle for the LSH path.
- ``link_lsh``    — the 100 TB path. Both sides get sign-LSH band
  signatures (8 bands × 8 bits over deterministic hyperplanes);
  candidates = equi-join on (type, color, band_idx, band_sig) — the
  metadata filters *are* part of the blocking key, so hot attribute
  values ("black") are already split 65536-ways per band, and AQE
  skew join handles residual imbalance. Exact cosine re-rank on
  candidates. Recall for near-duplicate photos (cosine ≥ 0.98)
  ≈ 99.9% (1 - (1 - (1-θ/π)^16)^16); verified ≥ 0.95 vs brute force
  in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import taxonomy as tx
from ..functions.embeddings import cosine_col, hyperplanes, make_signature_udf

# 16 bands × 16 bits: at a 200k catalog, 8-bit signatures left ~27
# random collisions per (band, hot type×color) block — ~400M candidate
# rows. 16-bit signatures cut random collisions 256× while keeping
# recall ≈0.999 for near-duplicate matches (cosine ≥ 0.98).
NBITS = 256
NBANDS = 16


def _top1_then_threshold(scored: DataFrame, query_keys: list[str],
                         top_k: int, threshold: float) -> DataFrame:
    """W5 gate: rank all candidates, keep rank-1, then threshold.

    Ties broken by product_id asc (Pinecone's ordering is unspecified;
    this makes results deterministic and is pinned by the oracle).
    """
    w = Window.partitionBy(*query_keys).orderBy(
        F.desc("score"), F.asc("product_id"))
    ranked = scored.withColumn("rank", F.row_number().over(w))
    return (ranked.filter(F.col("rank") <= top_k)
            .filter((F.col("rank") == 1) & (F.col("score") >= threshold))
            .drop("rank"))


def _catalog_side(catalog: DataFrame) -> DataFrame:
    return catalog.select(
        "product_id",
        F.col("type").alias("c_type"), F.col("color").alias("c_color"),
        F.col("gender").alias("c_gender"),
        F.col("category").alias("c_category"),
        F.col("embedding").alias("c_embedding"))


def _mention_side(mentions: DataFrame) -> DataFrame:
    return mentions.select(
        "doc_id", "span_idx", "attrs", "embedding",
        F.col("attrs.type").alias("m_type"),
        F.col("attrs.color").alias("m_color"),
        F.col("attrs.gender").alias("m_gender"))


def _filter_cond():
    """Metadata filters (process_social_media_images.py:78-82): type
    equality, color equality, gender ∈ {unisex, mention gender}."""
    return ((F.col("m_type") == F.col("c_type"))
            & (F.col("m_color") == F.col("c_color"))
            & ((F.col("c_gender") == "unisex")
               | (F.col("c_gender") == F.col("m_gender"))))


def link_exact(mentions: DataFrame, catalog: DataFrame,
               top_k: int = tx.LINK_TOP_K,
               threshold: float = tx.LINK_THRESHOLD) -> DataFrame:
    """Broadcast-join exact variant (small/medium dims).

    The cosine is computed map-side immediately after the broadcast
    join and BOTH embedding columns are projected away before the
    top-k window: the window is a shuffle, and shipping two 512-d
    vectors per candidate through it is ~30× the bytes of the scored
    row (measured: the shuffle I/O inverted core-count scaling)."""
    m = _mention_side(mentions)
    c = F.broadcast(_catalog_side(catalog))
    cand = m.join(c, _filter_cond(), "inner")
    scored = cand.withColumn("score", cosine_col("embedding", "c_embedding")) \
        .select("doc_id", "span_idx", "product_id",
                F.col("c_category").alias("category"), "attrs", "score")
    return _top1_then_threshold(scored, ["doc_id", "span_idx"],
                                top_k, threshold)


def link_lsh(mentions: DataFrame, catalog: DataFrame,
             top_k: int = tx.LINK_TOP_K,
             threshold: float = tx.LINK_THRESHOLD,
             nbits: int = NBITS, nbands: int = NBANDS) -> DataFrame:
    """LSH-blocked variant — the plan that survives a 1M+ catalog.

    Two-phase, narrow-row design:

    1. **Candidate generation**: both sides banded (``nbands``×
       replication) but carrying ONLY ids + blocking keys — all
       equalities in the ON clause so (band, bsig, type, color) are
       hash-join keys (a post-join filter would key on band/bsig alone
       → candidate explosion on hot bands). Vectors must NOT ride
       through this join: the catalog side is replicated nbands×, and
       512-d embeddings × replication OOM'd 8 GB executors at a 200k
       catalog — ids are ~50 B/row instead.
    2. **Re-rank**: distinct candidate (mention, product) pairs join
       each side's embedding back BY ID (one narrow shuffle each),
       exact cosine, top-1-then-threshold gate.

    AQE skew-join splits residual hot blocks; the metadata filters are
    part of the blocking key so head attribute values ("black") are
    already spread across 2^bits_per_band × nbands partitions.
    """
    planes = hyperplanes(tx.IMG_DIM, nbits, seed_key="link-img")
    sig = make_signature_udf(planes, nbands)

    m = _mention_side(mentions).withColumn("sigs", sig("embedding"))
    c = _catalog_side(catalog).withColumn("sigs", sig("c_embedding"))

    mb = m.select("doc_id", "span_idx", "m_type", "m_color", "m_gender",
                  F.posexplode("sigs").alias("m_band", "m_bsig"))
    cb = c.select("product_id", "c_type", "c_color", "c_gender",
                  F.posexplode("sigs").alias("c_band", "c_bsig"))
    cand = mb.join(
        cb,
        (F.col("m_band") == F.col("c_band"))
        & (F.col("m_bsig") == F.col("c_bsig"))
        & _filter_cond(),
        "inner",
    ).select("doc_id", "span_idx", "product_id") \
        .dropDuplicates(["doc_id", "span_idx", "product_id"])

    m_vec = m.select("doc_id", "span_idx", "attrs", "embedding")
    c_vec = c.select("product_id", F.col("c_category").alias("category"),
                     "c_embedding")
    paired = cand.join(m_vec, ["doc_id", "span_idx"]).join(c_vec, "product_id")
    scored = _dot_arrow(paired, "embedding", "c_embedding", "score")
    return _top1_then_threshold(scored, ["doc_id", "span_idx"],
                                top_k, threshold)


def _dot_arrow(df: DataFrame, a_col: str, b_col: str,
               out_col: str, cosine: bool = False) -> DataFrame:
    """Row-wise dot product (or, with ``cosine=True``, full cosine
    a·b/(|a||b|)) of two array<float> columns via a ``mapInArrow``
    kernel (batched einsum over the flattened buffers — Catalyst's
    ``aggregate``/``zip_with`` form is interpreted per element and was
    the linking hot spot). Drops both vector columns, so downstream
    shuffles (e.g. a top-k window) carry narrow scored rows only.
    """
    import numpy as np
    from pyspark.sql import types as T

    keep = [f for f in df.schema.fields if f.name not in (a_col, b_col)]
    out_schema = T.StructType(keep + [T.StructField(out_col, T.DoubleType())])
    keep_names = [f.name for f in keep]

    def kernel(batches):
        import pyarrow as pa
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            a = np.asarray(rb.column(a_col).flatten(),
                           dtype=np.float64).reshape(n, -1)
            b = np.asarray(rb.column(b_col).flatten(),
                           dtype=np.float64).reshape(n, -1)
            dots = np.einsum("ij,ij->i", a, b)
            if cosine:
                na = np.sqrt(np.einsum("ij,ij->i", a, a))
                nb = np.sqrt(np.einsum("ij,ij->i", b, b))
                dots = dots / np.maximum(na * nb, 1e-300)
            yield pa.RecordBatch.from_arrays(
                [*(rb.column(c) for c in keep_names),
                 pa.array(dots, type=pa.float64())],
                names=[*keep_names, out_col])

    return df.mapInArrow(kernel, out_schema)


def link_broadcast_matmul(mentions: DataFrame, catalog: DataFrame,
                          top_k: int = tx.LINK_TOP_K,
                          threshold: float = tx.LINK_THRESHOLD) -> DataFrame:
    """Broadcast-kernel exact variant: the dim-sized catalog is
    collected once, partitioned by (type, color) on the driver, and
    every mention batch resolves its top-1 match with one numpy
    matmul per metadata group inside ``mapInPandas``.

    Same semantics as ``link_exact`` (metadata filters → cosine →
    top-1-then-threshold, ties to min product_id), pinned by a parity
    test. Physically superior for a Pinecone-sized catalog: zero
    shuffles (the relational form pays a join plus a 500k-row window
    exchange, and its per-candidate ``aggregate``/``zip_with`` cosine
    is interpreted expression eval, not codegen — measured 37 s of
    the bench build; this kernel is ~2 s). ``top_k`` only gates the
    reference's W5 rank-1 check, so emitting the argmax is exact.
    """
    import numpy as np
    from pyspark.sql import types as T

    packed = _pack_catalog(catalog)
    bc = mentions.sparkSession.sparkContext.broadcast(packed)

    m = _mention_side(mentions)
    out_schema = T.StructType([
        T.StructField("doc_id", m.schema["doc_id"].dataType),
        T.StructField("span_idx", m.schema["span_idx"].dataType),
        T.StructField("product_id", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("attrs", m.schema["attrs"].dataType),
        T.StructField("score", T.DoubleType()),
    ])

    def kernel(batches):
        # mapInArrow: the embedding ListArray flattens to one float32
        # buffer (zero copies, no per-row ndarray boxing), the attrs
        # struct passes through via take()
        import pyarrow as pa
        cat = bc.value
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            emb = rb.column("embedding")
            vecs = np.asarray(emb.flatten(), dtype=np.float64) \
                .reshape(n, -1)
            m_type = rb.column("m_type").to_pylist()
            m_color = rb.column("m_color").to_pylist()
            m_gender = np.asarray(rb.column("m_gender").to_pylist(),
                                  dtype=object)
            by_key: dict = {}
            for i, k in enumerate(zip(m_type, m_color)):
                by_key.setdefault(k, []).append(i)
            out_idx: list = []
            out_pid: list = []
            out_cat: list = []
            out_score: list = []
            for k, idxs in by_key.items():
                g = cat.get(k)
                if g is None:
                    continue
                pids, cats, genders, cmat = g
                sims = vecs[idxs] @ cmat.T            # (b, |group|)
                mg = m_gender[idxs]
                allowed = (genders[None, :] == "unisex") | \
                          (genders[None, :] == mg[:, None])
                sims = np.where(allowed, sims, -np.inf)
                best = np.argmax(sims, axis=1)        # first max = min pid
                bscore = sims[np.arange(len(idxs)), best]
                ok = np.nonzero(bscore >= threshold)[0]
                out_idx.extend(idxs[j] for j in ok)
                out_pid.extend(pids[best[j]] for j in ok)
                out_cat.extend(cats[best[j]] for j in ok)
                out_score.extend(float(bscore[j]) for j in ok)
            take = pa.array(out_idx, type=pa.int32())
            yield pa.RecordBatch.from_arrays(
                [rb.column("doc_id").take(take),
                 rb.column("span_idx").take(take),
                 pa.array(out_pid, type=pa.string()),
                 pa.array(out_cat, type=pa.string()),
                 rb.column("attrs").take(take),
                 pa.array(out_score, type=pa.float64())],
                names=["doc_id", "span_idx", "product_id", "category",
                       "attrs", "score"])

    return m.mapInArrow(kernel, out_schema)


def _pack_catalog(catalog: DataFrame) -> dict:
    """(type, color) → (pids, categories, genders, unit-vec matrix),
    sorted by product_id so argmax ties resolve to the min id."""
    import numpy as np

    rows = _catalog_side(catalog).collect()
    rows.sort(key=lambda r: r["product_id"])
    groups: dict = {}
    for r in rows:
        groups.setdefault((r["c_type"], r["c_color"]), []).append(r)
    return {
        k: (np.array([r["product_id"] for r in g], dtype=object),
            np.array([r["c_category"] for r in g], dtype=object),
            np.array([r["c_gender"] for r in g], dtype=object),
            np.stack([np.asarray(r["c_embedding"], dtype=np.float64)
                      for r in g]))
        for k, g in groups.items()
    }


def detect_and_link_fused(docs: DataFrame, catalog: DataFrame,
                          top_k: int = tx.LINK_TOP_K,
                          threshold: float = tx.LINK_THRESHOLD) -> DataFrame:
    """Mention detection + entity linking FUSED into one ``mapInArrow``
    kernel (the dim-sized-catalog fast path).

    The two-kernel plan (mentions kernel → link kernel) ships every
    mention's 512-d embedding Arrow→JVM→Arrow between them — ~2 KB/row
    of pure serialization for a column the linked output then drops.
    Fusing keeps embeddings in numpy registers: detect gates, extract
    attrs, embed, and matmul against the broadcast catalog inside one
    pass, emitting only the narrow linked rows. Semantics identical to
    ``image_mentions`` → ``link_broadcast_matmul`` (pinned by parity
    test); same top-1-then-threshold gate, ties to min product_id."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import types as T

    from ..functions.embeddings import ATTR_SCHEMA
    from .mentions import explode_spans

    spans = explode_spans(docs).filter(
        (F.col("kind") == "image_ref") & F.col("media_ref").isNotNull())
    packed = _pack_catalog(catalog)
    bc = spans.sparkSession.sparkContext.broadcast(packed)
    min_area = tx.MIN_AREA
    attr_fields = [(f.name, isinstance(f.dataType, T.ArrayType))
                   for f in ATTR_SCHEMA.fields]

    out_schema = T.StructType([
        T.StructField("doc_id", spans.schema["doc_id"].dataType),
        T.StructField("span_idx", spans.schema["span_idx"].dataType),
        T.StructField("product_id", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("attrs", ATTR_SCHEMA),
        T.StructField("score", T.DoubleType()),
    ])

    def kernel(batches):
        from ..datagen import base_attrs, content_embed
        from ..functions.hashing import segment_labels_areas

        cat = bc.value
        for rb in batches:
            refs = np.asarray(rb.column("media_ref").to_pylist(), dtype="U")
            if len(refs) == 0:
                continue
            labels, areas = segment_labels_areas(refs)
            mask = (labels != "Background") & (areas >= min_area)
            if not mask.any():
                continue
            idx = np.nonzero(mask)[0]
            refs_k = refs[idx]
            attrs = base_attrs(refs_k)
            vecs = content_embed(refs_k).astype(np.float64)
            m_type = attrs["type"]
            m_color = attrs["color"]
            m_gender = np.asarray(attrs["gender"], dtype=object)
            by_key: dict = {}
            for i, k in enumerate(zip(m_type, m_color)):
                by_key.setdefault(k, []).append(i)
            sel_local: list = []        # indices into refs_k / attrs
            out_pid: list = []
            out_cat: list = []
            out_score: list = []
            for k, idxs in by_key.items():
                g = cat.get(k)
                if g is None:
                    continue
                pids, cats, genders, cmat = g
                sims = vecs[idxs] @ cmat.T
                mg = m_gender[idxs]
                allowed = (genders[None, :] == "unisex") | \
                          (genders[None, :] == mg[:, None])
                sims = np.where(allowed, sims, -np.inf)
                best = np.argmax(sims, axis=1)      # first max = min pid
                bscore = sims[np.arange(len(idxs)), best]
                ok = np.nonzero(bscore >= threshold)[0]
                sel_local.extend(idxs[j] for j in ok)
                out_pid.extend(pids[best[j]] for j in ok)
                out_cat.extend(cats[best[j]] for j in ok)
                out_score.extend(float(bscore[j]) for j in ok)
            if not sel_local:
                continue
            attrs_arr = pa.StructArray.from_arrays(
                [pa.array([attrs[name][i] for i in sel_local],
                          type=pa.list_(pa.string()) if is_arr
                          else pa.string())
                 for name, is_arr in attr_fields],
                [name for name, _ in attr_fields])
            take_orig = pa.array(idx[sel_local].astype(np.int32))
            yield pa.RecordBatch.from_arrays(
                [rb.column("doc_id").take(take_orig),
                 rb.column("span_idx").take(take_orig),
                 pa.array(out_pid, type=pa.string()),
                 pa.array(out_cat, type=pa.string()),
                 attrs_arr,
                 pa.array(out_score, type=pa.float64())],
                names=["doc_id", "span_idx", "product_id", "category",
                       "attrs", "score"])

    return spans.mapInArrow(kernel, out_schema)


# Driver-broadcast budget for the packed-catalog fast paths
# (_pack_catalog → link_broadcast_matmul / detect_and_link_fused).
# A row gate alone is not a memory contract: 100k rows × 512-d
# float64 is ~410 MB of packed numpy on the driver AND inside every
# executor Python worker — the BYTES are what OOM, not the rows, and
# a 4096-d catalog must fall back to LSH long before 100k rows.
# Estimated packed size = rows × (dim × 8 + per-row overhead for the
# three object arrays: product_id/category/gender strings).
BROADCAST_MAX_ROWS = 100_000
BROADCAST_BUDGET_MB = 256
_PACK_ROW_OVERHEAD = 160


def est_packed_bytes(catalog: DataFrame) -> tuple[int, int]:
    """(rows, estimated packed bytes) for the broadcast fast path —
    ONE agg job (count + max embedding length; both metadata-cheap on
    parquet/Iceberg scans with column pruning)."""
    row = catalog.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.size("embedding")).alias("dim")).first()
    n = row["n"]
    dim = row["dim"] or 0
    return n, n * (dim * 8 + _PACK_ROW_OVERHEAD)


def fits_driver_broadcast(catalog: DataFrame,
                          max_rows: int = BROADCAST_MAX_ROWS,
                          budget_mb: int = BROADCAST_BUDGET_MB) -> bool:
    """True iff the catalog fits the packed driver-broadcast fast
    path, asserted in BYTES (estimated packed size), not just rows."""
    n, est = est_packed_bytes(catalog)
    return n <= max_rows and est <= budget_mb << 20


def link_mentions(mentions: DataFrame, catalog: DataFrame,
                  strategy: str = "auto", **kw) -> DataFrame:
    """Pick the physical strategy: broadcast-exact while the catalog is
    dim-sized, LSH-blocked once it isn't (mirrors Spark's own
    broadcast-threshold philosophy, but the cosine join needs the
    decision made here, above Catalyst)."""
    if strategy == "exact":
        return link_exact(mentions, catalog, **kw)
    if strategy == "matmul":
        return link_broadcast_matmul(mentions, catalog, **kw)
    if strategy == "lsh":
        return link_lsh(mentions, catalog, **kw)
    # auto: dim-size probe in rows AND bytes. Dim-sized catalog →
    # broadcast matmul kernel (exact, zero-shuffle); big or wide
    # catalog → LSH blocking.
    if fits_driver_broadcast(catalog):
        return link_broadcast_matmul(mentions, catalog, **kw)
    return link_lsh(mentions, catalog, **kw)
