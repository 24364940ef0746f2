import numpy as np

from fashion_knowledge_graph_spark import datagen


def test_deterministic(tmp_path, docs_pdf):
    p = datagen.write_fixtures(str(tmp_path), n_docs=200, n_products=120, seed=42)
    import pandas as pd

    d2 = pd.read_parquet(p["docs"])
    assert len(d2) == len(docs_pdf)
    for a, b in zip(docs_pdf["spans"], d2["spans"]):
        assert list(a) == list(b)


def test_span_invariants(docs_pdf):
    for spans in docs_pdf["spans"]:
        offsets = [s["offset"] for s in spans]
        assert offsets == sorted(offsets) and len(set(offsets)) == len(offsets)
        for s in spans:
            if s["kind"] == "text":
                assert s["text"] is not None and s["media_ref"] is None
            else:
                assert s["media_ref"] is not None and s["text"] is None


def test_catalog_embedding_consistency(catalog_pdf):
    v1 = np.stack(catalog_pdf["embedding"].to_numpy())
    v2 = datagen.content_embed(catalog_pdf["image_path"].to_numpy())
    assert np.allclose(v1, v2, atol=1e-6)
    norms = np.linalg.norm(v1, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-5)


def test_duplicates_exist_and_are_near(catalog_pdf):
    dups = catalog_pdf[catalog_pdf["image_path"].str.contains("#d")]
    assert len(dups) > 0
    orig = catalog_pdf.drop_duplicates("entity_key", keep="first") \
        .set_index("entity_key")
    for r in dups.head(10).itertuples():
        o = orig.loc[r.entity_key]
        cos = float(np.dot(np.asarray(r.embedding), np.asarray(o.embedding)))
        assert cos >= 0.98
        assert o.type == r.type and o.color == r.color


def test_embedding_space_geometry(catalog_pdf):
    """Pin the cosine margins every pipeline threshold depends on
    (attribute-compositional space, hashing.attr_mixture docstring):

      link 0.7   — variant≥base must clear it; distinct items must not
      dup  0.98  — duplicate listings must clear it; same-attr
                   distinct entities must not
      clip 0.2   — description text must clear it for its own item;
                   vocabulary-free text must not clear it for anything
    """
    from fashion_knowledge_graph_spark import taxonomy as tx
    from fashion_knowledge_graph_spark.functions.hashing import (
        clip_text_vecs,
    )

    V = np.stack(catalog_pdf["embedding"].to_numpy()).astype(np.float64)
    ek = catalog_pdf["entity_key"].to_numpy()
    n = len(catalog_pdf)
    sims = V @ V.T
    same_ent = (ek[:, None] == ek[None, :]) & ~np.eye(n, dtype=bool)
    distinct = ~same_ent & ~np.eye(n, dtype=bool)
    # duplicate listings comfortably above the 0.98 dedup threshold
    assert sims[same_ent].min() >= 0.985
    # distinct entities comfortably below the 0.7 linking threshold
    assert sims[distinct].max() <= 0.68
    # social-media variants link back to their base entity
    refs = ["img://%s#s1" % e for e in ek[:100]]
    mv = datagen.content_embed(refs).astype(np.float64)
    assert (mv * V[:100]).sum(axis=1).min() >= 0.9
    # CLIP text of a style description retrieves its own item…
    descs = catalog_pdf["style_description"].to_numpy()[:20]
    q = clip_text_vecs(descs, tx.IMG_DIM).astype(np.float64)
    assert (q * V[:20]).sum(axis=1).min() >= 0.3
    # …and vocabulary-free text retrieves nothing at the 0.2 gate
    junk = clip_text_vecs(
        np.array(["xyzzy plugh nothing", "qqq www zz"]), tx.IMG_DIM) \
        .astype(np.float64)
    assert np.abs(junk @ V.T).max() < 0.2
