"""Image near-dup (dHash + banded exact-recall join): operators/imagesim.py."""

import numpy as np
import pytest

from dirt_hadoop_similarity_spark.operators import imagesim, multimodal
from dirt_hadoop_similarity_spark.operators.imagesim import (
    dhash64,
    dhash_near_dups,
    image_dhash,
    near_dup_images,
)


def _gradient(w, h, ch=3, seed=7):
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 5 + yy * 3 + (xx // 4) * (yy // 4)) % 160 + 40)
    noise = np.random.default_rng(seed).integers(0, 10, size=(h, w, ch))
    return np.clip(base[:, :, None] + noise, 0, 255).astype(np.uint8)


def _raster_bytes(arr):
    h, w, ch = arr.shape
    return (arr.tobytes(), w, h, ch)


def test_dhash_invariances():
    a = _gradient(40, 32)
    h0 = dhash64(*_raster_bytes(a))
    assert isinstance(h0, int)

    # uniform brightness shift preserves every adjacent-cell comparison
    bright = np.clip(a.astype(np.int16) + 20, 0, 255).astype(np.uint8)
    assert dhash64(*_raster_bytes(bright)) == h0

    # 2x pixel doubling: area-mean cells are identical means
    up = a.repeat(2, axis=0).repeat(2, axis=1)
    assert dhash64(*_raster_bytes(up)) == h0

    # an unrelated image hashes far away
    b = _gradient(40, 32, seed=99)
    other = dhash64(*_raster_bytes(np.rot90(b).copy()))
    d = (h0 ^ other) & 0xFFFFFFFFFFFFFFFF
    assert bin(d).count("1") > 8

    # degenerate inputs quarantine as None, never raise
    assert dhash64(None, 4, 4, 3) is None
    assert dhash64(b"\x00" * 10, 4, 4, 3) is None  # torn tensor
    assert dhash64(b"", 0, 0, 0) is None


def test_dhash_channel_layouts_agree():
    rgb = _gradient(24, 24, ch=3)
    h_rgb = dhash64(*_raster_bytes(rgb))
    rgba = np.dstack([rgb, np.full((24, 24), 255, dtype=np.uint8)])
    assert dhash64(*_raster_bytes(rgba)) == h_rgb  # alpha ignored

    gray = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
            + 0.114 * rgb[:, :, 2]).astype(np.uint8)[:, :, None]
    ga = np.dstack([gray[:, :, 0], np.zeros((24, 24), dtype=np.uint8)])
    # gray and gray+alpha share the luma-plane path
    assert dhash64(*_raster_bytes(gray)) == dhash64(*_raster_bytes(ga))


def test_image_dhash_dataframe_contract(spark):
    a = _gradient(16, 12)
    rows = [
        (1, "image", 16, 12, 3, bytearray(a.tobytes())),
        (2, "image", None, None, None, None),  # quarantined upstream
    ]
    decoded = spark.createDataFrame(
        rows, multimodal.PIXELS_SCHEMA)
    out = {r["media_id"]: r["dhash"]
           for r in image_dhash(decoded).collect()}
    assert out[1] == dhash64(*_raster_bytes(a))
    assert out[2] is None  # NULL row kept, NULL hash

    plan = image_dhash(decoded)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # pixels never shuffle


def _brute_pairs(hashes, max_hamming):
    out = set()
    ids = sorted(hashes)
    for i, x in enumerate(ids):
        for y in ids[i + 1:]:
            d = (hashes[x] ^ hashes[y]) & 0xFFFFFFFFFFFFFFFF
            hd = bin(d).count("1")
            if hd <= max_hamming:
                out.add((x, y, hd))
    return out


def test_near_dups_exact_recall_vs_bruteforce(spark):
    """bands = max_hamming + 1 is EXACT by pigeonhole: the banded join
    must reproduce the brute-force pair set bit-for-bit — including
    hashes with bit 63 set (negative as int64, exercising the unsigned
    shift/mask and bit_count on negatives)."""
    rng = np.random.default_rng(42)
    base = rng.integers(0, 1 << 63, size=12, dtype=np.int64) * 2 + 1
    hashes = {}
    mid = 0
    for h in base.tolist():
        hashes[mid] = h & 0xFFFFFFFFFFFFFFFF
        mid += 1
        # a few perturbed copies at controlled Hamming distances
        for k in (1, 3, 4, 5, 9):
            flips = rng.choice(64, size=k, replace=False)
            v = hashes[mid - 1]
            for f in flips.tolist():
                v ^= 1 << f
            hashes[mid] = v
            mid += 1

    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    df = spark.createDataFrame(
        [(m, signed(v)) for m, v in hashes.items()],
        imagesim.HASH_SCHEMA)
    got = {(r["id_a"], r["id_b"], r["hamming"])
           for r in dhash_near_dups(df, max_hamming=4).collect()}
    assert got == _brute_pairs(hashes, 4)

    # bands=1 degenerates to exact-dup detection
    got0 = {(r["id_a"], r["id_b"], r["hamming"])
            for r in dhash_near_dups(df, max_hamming=0, bands=1).collect()}
    assert got0 == _brute_pairs(hashes, 0)


def test_near_dups_plan_has_no_cartesian(spark):
    df = spark.createDataFrame([(1, 5), (2, 7)], imagesim.HASH_SCHEMA)
    pairs = dhash_near_dups(df, max_hamming=4)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_near_dups_validation():
    import pandas as pd  # noqa: F401 — symmetry with other tests

    with pytest.raises(ValueError, match="bands"):
        dhash_near_dups(None, max_hamming=1, bands=0)
    with pytest.raises(ValueError, match="pigeonhole"):
        dhash_near_dups(None, max_hamming=5, bands=5)


def test_end_to_end_real_containers(spark):
    """The composed chain on REAL container bytes through the REAL
    decoders: a PNG, the same raster re-encoded as BMP (exact dup,
    hamming 0), a brightness-shifted PNG (near dup), and an unrelated
    image — near_dup_images finds exactly the true pairs.  Container
    encoders come from test_multimodal's shared reference builders
    (code review r16: no per-file encoder copies)."""
    from tests.test_multimodal import _bmp_encode, _png_encode

    def png(arr):
        h, w, _ = arr.shape
        return _png_encode(w, h, 2, arr.tobytes(), [0])

    def bmp(arr):
        h, w, _ = arr.shape
        return _bmp_encode(w, h, 24, arr.tobytes())

    a = _gradient(32, 24)
    bright = np.clip(a.astype(np.int16) + 15, 0, 255).astype(np.uint8)
    other = _gradient(32, 24, seed=1234)
    other = np.rot90(other, 2).copy()
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(png(a))),
            (2, "image", bytearray(bmp(a))),
            (3, "image", bytearray(png(bright))),
            (4, "image", bytearray(png(other))),
            (5, "image", bytearray(b"not an image")),  # quarantines
        ],
        "media_id long, kind string, payload binary")
    decoded = multimodal.decode_pixels(media)  # real decode, no knob
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in near_dup_images(decoded, max_hamming=4).collect()}
    assert pairs[(1, 2)] == 0  # container re-encode: exact dup
    assert (1, 3) in pairs and (2, 3) in pairs  # brightness near-dup
    assert not any(4 in p or 5 in p for p in pairs)


def test_tiny_images_and_grid_validation():
    """Code review r16: a 1x1 tracking pixel must NOT hash (every tiny
    image collapsed to hash 0 — unrelated pixels read as exact dups);
    and a grid whose grid*grid bits exceed the 64-bit hash must fail at
    the API, not mis-key the banded join."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no mean-of-empty-slice spam
        assert dhash64(b"\xff\x00\x00", 1, 1, 3) is None
        assert dhash64(b"\x00\x00\xff", 1, 1, 3) is None
        assert dhash64(b"\x01" * (4 * 3 * 3), 4, 3, 3) is None  # < grid
        # smallest hashable geometry: (grid+1) x grid
        raster98 = bytes((i * 7) % 256 for i in range(9 * 8 * 3))
        ok = dhash64(raster98, 9, 8, 3)
        assert ok is not None

    with pytest.raises(ValueError, match="grid"):
        dhash64(b"\x00" * 300, 10, 10, 3, grid=16)
    with pytest.raises(ValueError, match="grid"):
        image_dhash(None, grid=9)  # plan-build-time validation
    with pytest.raises(ValueError, match="grid"):
        image_dhash(None, grid=0)


def test_dhash_clusters_scalable_composition(spark):
    """The pair-blowup guard: exact-hash groups cluster linearly (one
    row per member, min-id representative), and banding only the
    representatives reproduces every cross-cluster near-dup relation —
    members inherit their representative's neighbors by hash
    equality."""
    rows = [(1, 100), (2, 100), (3, 100),     # 3 exact copies
            (4, 101),                          # hamming 1 from 100
            (5, 0xF0F0), (6, 0xF0F0),          # far copy pair (hd 7)
            (7, None)]                         # quarantined
    df = spark.createDataFrame(rows, imagesim.HASH_SCHEMA)
    cl = imagesim.dhash_clusters(df)
    got = {(r["media_id"], r["cluster_rep"]) for r in cl.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)}

    reps = cl.where("cluster_rep = media_id").select("media_id", "dhash")
    pairs = {(r["id_a"], r["id_b"], r["hamming"])
             for r in dhash_near_dups(reps, max_hamming=4).collect()}
    # only the representative pair appears — 3x2 member pairs of the
    # 100-cluster never materialize, and 100~101 is found once
    assert pairs == {(1, 4, 1)}


def test_pixel_feature_vec_structure_and_invariance():
    """Embedding = contrast-normalized luma thumbnail + per-channel
    stats: thumbnail block identical under uniform brightness shift
    (only the mean stats move); gray images replicate their channel
    across the color slots; degenerate inputs -> None; bad thumb ->
    ValueError."""
    a = _gradient(32, 24)
    v = imagesim.pixel_feature_vec(*_raster_bytes(a))
    assert len(v) == 4 * 4 + 6

    bright = np.clip(a.astype(np.int16) + 30, 0, 255).astype(np.uint8)
    vb = imagesim.pixel_feature_vec(*_raster_bytes(bright))
    assert np.allclose(v[:16], vb[:16], atol=1e-3)  # shape block stable
    assert vb[16] > v[16]  # mean stat moved up

    gray = a[:, :, :1].copy()
    vg = imagesim.pixel_feature_vec(*_raster_bytes(gray))
    assert vg[16] == vg[17] == vg[18]  # replicated channel stats

    assert imagesim.pixel_feature_vec(None, 4, 4, 3) is None
    assert imagesim.pixel_feature_vec(b"\x00" * 5, 4, 4, 3) is None
    assert imagesim.pixel_feature_vec(b"\x00" * 27, 3, 3, 3) is None  # < thumb
    with pytest.raises(ValueError, match="thumb"):
        imagesim.pixel_feature_vec(b"\x00" * 300, 10, 10, 3, thumb=17)
    with pytest.raises(ValueError, match="thumb"):
        imagesim.pixel_features(None, thumb=0)


def test_pixel_features_feed_the_ann_toolbox(spark):
    """The decode -> embedding bridge end-to-end: real containers
    through the real decoders, pixel_features embeddings through the
    EXISTING vector operators (valid_vectors admission + brute-force
    cosine top-k) — the duplicate raster is its twin's nearest
    neighbor with cosine ~1, and the quarantined row is dropped at
    admission like any failed embedding job."""
    from dirt_hadoop_similarity_spark.operators import similarity
    from tests.test_multimodal import _bmp_encode, _png_encode

    a = _gradient(32, 24)
    other = np.rot90(_gradient(32, 24, seed=77), 2).copy()
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(_png_encode(32, 24, 2, a.tobytes(),
                                               [0]))),
            (2, "image", bytearray(_bmp_encode(32, 24, 24, a.tobytes()))),
            (3, "image", bytearray(_png_encode(32, 24, 2,
                                               other.tobytes(), [0]))),
            (4, "image", bytearray(b"junk")),
        ],
        "media_id long, kind string, payload binary")
    from dirt_hadoop_similarity_spark.operators import multimodal

    feats = imagesim.pixel_features(multimodal.decode_pixels(media))
    rows = {r["media_id"]: r["embedding"] for r in feats.collect()}
    assert rows[4] is None and len(rows[1]) == 22

    admitted = similarity.valid_vectors(feats, dim=22,
                                        vec_col="embedding")
    assert admitted.count() == 3
    topk = similarity.cosine_topk(admitted, query_ids=[1], k=2,
                                  id_col="media_id",
                                  vec_col="embedding")
    nn = {r["rank"]: (r["neighbor_id"], r["cos"])
          for r in topk.collect()}
    assert nn[1][0] == 2 and nn[1][1] > 0.999  # the re-encoded twin
    assert nn[2][0] == 3 and nn[2][1] < nn[1][1]
