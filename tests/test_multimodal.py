import numpy as np
import pytest

from fashion_knowledge_graph_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    refs = spark.createDataFrame(
        [(f"img://ent{i:08d}",) for i in range(20)], "media_ref string")
    return mm.synthesize_media(refs)


def test_media_schema_and_metadata(spark, media_df):
    rows = media_df.collect()
    assert len(rows) == 20
    for r in rows:
        assert r["mime"] in ("image/png", "video/mp4")
        assert isinstance(r["content"], (bytes, bytearray))
        assert r["meta"]["n_bytes"] == len(r["content"])
        assert 32 <= r["meta"]["width"] < 544
        assert 32 <= r["meta"]["height"] < 544
        if r["mime"] == "video/mp4":
            assert 500 <= r["meta"]["duration_ms"] < 9500
        else:
            assert r["meta"]["duration_ms"] is None
    # deterministic ~25% video split is non-vacuous in both directions
    mimes = {r["mime"] for r in rows}
    assert mimes == {"image/png", "video/mp4"}


def test_decode_stub_gated(media_df):
    r = media_df.first()
    with pytest.raises(NotImplementedError):
        mm.decode_image(bytes(r["content"]), 8, 8, fake=False)
    px = mm.decode_image(bytes(r["content"]), 8, 8, fake=True)
    assert px.shape == (8, 8) and px.dtype == np.uint8
    # deterministic
    px2 = mm.decode_image(bytes(r["content"]), 8, 8, fake=True)
    assert (px == px2).all()


def test_extract_features_shape_and_determinism(spark, media_df):
    f1 = {r["media_id"]: r["feature"]
          for r in mm.extract_features(media_df).collect()}
    f2 = {r["media_id"]: r["feature"]
          for r in mm.extract_features(media_df).collect()}
    assert set(f1) == {r["media_id"] for r in media_df.collect()}
    for k, v in f1.items():
        assert len(v) == mm.FEATURE_DIM
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)
        assert list(v) == list(f2[k])


def test_resize_meta(spark, media_df):
    rows = mm.resize_meta(media_df, max_side=64).collect()
    for r in rows:
        w, h = r["meta"]["width"], r["meta"]["height"]
        assert max(r["target_width"], r["target_height"]) <= 65  # rounding
        if max(w, h) <= 64:
            assert not r["needs_resize"]
            assert (r["target_width"], r["target_height"]) == (w, h)
        else:
            assert r["needs_resize"]


def test_frame_sample_plan(spark):
    media = spark.createDataFrame(
        [("v1", "video/mp4", bytearray(b"x"), (None, None, 3500, 1)),
         ("v2", "video/mp4", bytearray(b"y"), (None, None, None, 1))],
        mm.MEDIA_SCHEMA)
    got = {}
    for r in mm.frame_sample_plan(media, every_ms=1000).collect():
        got.setdefault(r["media_id"], []).append(r["frame_ms"])
    assert sorted(got["v1"]) == [0, 1000, 2000, 3000]
    assert got["v2"] == [0]


def test_audio_chunk_plan(spark):
    import pytest as _pytest
    media = spark.createDataFrame(
        [("a1", "audio/wav", bytearray(b"x"), (None, None, 5200, 1)),
         ("a2", "audio/wav", bytearray(b"y"), (None, None, 1000, 1)),
         ("img", "image/png", bytearray(b"z"), (None, None, None, 1))],
        mm.MEDIA_SCHEMA)
    got = {}
    for r in mm.audio_chunk_plan(media, chunk_ms=2000,
                                 overlap_ms=500).collect():
        got.setdefault(r["media_id"], []).append(
            (r["chunk_idx"], r["start_ms"], r["end_ms"]))
    # starts every 1500 ms, ends clipped to 5200
    assert sorted(got["a1"]) == [(0, 0, 2000), (1, 1500, 3500),
                                 (2, 3000, 5000), (3, 4500, 5200)]
    # shorter than one chunk: single clipped window
    assert got["a2"] == [(0, 0, 1000)]
    # untimed media produce NO chunks (no waveform to window)
    assert "img" not in got
    with _pytest.raises(ValueError, match="overlap"):
        mm.audio_chunk_plan(media, chunk_ms=500, overlap_ms=500)


def test_phash_pipeline_matches_numpy_replay(spark):
    """Clustered synthesis -> integer pool sums -> pHash -> banded
    near-dup, each stage replayed bit-for-bit in numpy."""
    import hashlib
    import itertools

    import numpy as np

    docs = spark.createDataFrame([(i,) for i in range(40)],
                                 "doc_id long")
    media = mm.synthesize_media_clustered(docs, n_bases=8)
    sums = mm.pixel_pool_sums(media)
    codes = mm.phash64(sums)
    pairs = mm.phash_near_dup(codes, max_hamming=8)

    def md5hex(s):
        return hashlib.md5(s.encode()).hexdigest()

    def ref_code(i):
        base, mid = f"img://base{i % 8:08d}", f"img://doc{i:08d}"
        hx0 = md5hex(base) * 8
        p = int(md5hex(mid + ":p")[:15], 16) % 128
        hx = hx0[:2 * p + 1] + md5hex(mid)[0] + hx0[2 * p + 2:]
        b = np.array([int(hx[2 * j:2 * j + 2], 16) for j in range(128)],
                     dtype=np.int64)
        px = b[np.arange(32 * 48) % 128].reshape(32, 48)
        u = np.concatenate([px.sum(axis=0) * 3, px.sum(axis=1)[:16] * 2])
        bits = (u * 64 > u.sum())
        return [int(sum(int(bits[16 * k + i]) << i for i in range(16)))
                for k in range(4)], mid

    ref = {mid: bands for bands, mid in
           (ref_code(i) for i in range(40))}
    got_codes = {r["media_id"]: [r["b0"], r["b1"], r["b2"], r["b3"]]
                 for r in codes.collect()}
    assert got_codes == ref

    # reference pairs: band-blocked candidates, Hamming <= 8
    def ham(x, y):
        return sum(bin(a ^ b).count("1") for a, b in zip(x, y))

    want = set()
    for a, b in itertools.combinations(sorted(ref), 2):
        if any(x == y for x, y in zip(ref[a], ref[b])) \
                and ham(ref[a], ref[b]) <= 8:
            want.add((a, b, ham(ref[a], ref[b])))
    got = {(r["src"], r["dst"], r["hamming"]) for r in pairs.collect()}
    assert got == want
    # clusters exist: at least one exact-duplicate-grade pair
    assert any(h <= 2 for _, _, h in got)
