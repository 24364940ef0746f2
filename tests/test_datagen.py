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
