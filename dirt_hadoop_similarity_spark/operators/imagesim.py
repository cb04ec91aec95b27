"""Image near-duplicate detection: difference-hash over decoded rasters.

The image analog of the text MinHash-LSH chain (``operators/dedup.py``):
a 64-bit perceptual fingerprint computed once per image in the decode
pass, then a BANDED equi-join meets candidate pairs — never an all-pairs
comparison.  Unlike MinHash banding, the recall here is EXACT, not
probabilistic: splitting 64 bits into ``bands`` equal slices, any pair
with Hamming distance < bands has at least one identical slice
(pigeonhole), so ``bands = max_hamming + 1`` catches every true pair and
the ``bit_count`` verification removes the false ones.

Scale shape at 100 TB:

  * the hash rides the same Arrow-batched ``mapInPandas`` stage as
    :func:`multimodal.decode_pixels` output — pixels NEVER shuffle; only
    (media_id, 64-bit hash) leaves the stage (~16 bytes/row vs ~MB/row);
  * candidate generation is ``bands`` equi-joins (one exploded
    band-keyed self-join), shuffle volume bounded by real near-dup
    density exactly like the LSH bucket join;
  * verification is JVM-side ``bit_count(hash ^ hash)`` — no Python in
    the pair path.

The dHash itself (Krawetz's difference hash, public domain technique):
luma -> area-mean resample to (hash_w+1) x hash_w -> sign of horizontal
adjacent differences.  Robust to re-encoding, resize and uniform
brightness shifts; NOT robust to crops/rotations (that is embedding
territory — ``similarity.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_SCHEMA = "media_id long, dhash long"
FEATURES_SCHEMA = "media_id long, embedding array<float>"


def _raster_array(pixels: bytes, width: int, height: int,
                  channels: int):
    """(h, w, ch) float64 array from the PIXELS_SCHEMA tensor bytes,
    or None for a torn tensor."""
    import numpy as np

    arr = np.frombuffer(pixels, dtype=np.uint8)
    if arr.size != width * height * channels:
        return None  # torn tensor: quarantine like the decoders do
    return arr.reshape(height, width, channels).astype(np.float64)


def _to_luma(arr):
    """BT.601 luma plane from an (h, w, ch) array: RGB/RGBA use the
    weighted sum (alpha ignored); gray / gray+alpha use channel 0."""
    if arr.shape[2] >= 3:
        return (0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1]
                + 0.114 * arr[:, :, 2])
    return arr[:, :, 0]


def _area_mean(gray, out_h: int, out_w: int):
    """Box-filter resample to (out_h, out_w): rows/cols split into
    near-equal bins (exact when divisible; off-by-one-balanced
    otherwise), each cell the mean of its bin.  Caller guarantees the
    source is at least (out_h, out_w)."""
    import numpy as np

    h, w = gray.shape
    ge = np.linspace(0, h, out_h + 1).round().astype(int)
    ce = np.linspace(0, w, out_w + 1).round().astype(int)
    cells = np.empty((out_h, out_w), dtype=np.float64)
    for r in range(out_h):
        band = gray[ge[r]:max(ge[r + 1], ge[r] + 1)]
        for c in range(out_w):
            cells[r, c] = band[:, ce[c]:max(ce[c + 1], ce[c] + 1)].mean()
    return cells


def dhash64(pixels: bytes, width: int, height: int, channels: int,
            grid: int = 8):
    """64-bit difference hash of one decoded raster (top-down row-major
    8-bit samples, the :data:`multimodal.PIXELS_SCHEMA` tensor
    contract), or None for degenerate inputs.  Pure numpy; called from
    the Arrow-batched hash pass, never per-pair."""
    import numpy as np

    if not 1 <= grid <= 8:
        # grid*grid bits must fit the 64-bit hash the banded join and
        # the LongType schema carry (code review r16)
        raise ValueError(f"grid must be in [1, 8], got {grid}")
    if pixels is None or not width or not height or not channels:
        return None
    if width < grid + 1 or height < grid:
        # fewer source pixels than hash cells: every tiny image would
        # collapse to the same near-zero hash (a 1x1 tracking pixel
        # must NOT read as an exact dup of every other tracking pixel)
        # — quarantine like any other degenerate input (code review
        # r16)
        return None
    arr = _raster_array(pixels, width, height, channels)
    if arr is None:
        return None
    # area-mean resample of the luma plane to (grid+1) x grid — a box
    # filter, so the hash is stable under uniform re-scaling
    cells = _area_mean(_to_luma(arr), grid, grid + 1)
    bits = (cells[:, 1:] > cells[:, :-1]).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    # map to signed int64 (Spark LongType): bit 63 set -> negative
    return v - (1 << 64) if v >= (1 << 63) else v


def image_dhash(decoded: DataFrame, grid: int = 8) -> DataFrame:
    """(media_id, dhash) from :func:`multimodal.decode_pixels` output.

    Same distributed shape as the decoders: Arrow-batched
    ``mapInPandas`` over the source partitions as-is — the pixel column
    is consumed in-stage and never shuffles; only the 8-byte hash
    leaves.  Quarantined rows (NULL pixels) keep their row with a NULL
    hash, the uniform one-bad-payload-never-fails-the-task contract.
    Images smaller than the hash grid quarantine too (NULL hash) — a
    1x1 tracking pixel carries no gradient structure to fingerprint."""
    if not 1 <= grid <= 8:
        # fail at plan-build time, not inside every task
        raise ValueError(f"grid must be in [1, 8], got {grid}")

    def _hash(batches):
        import pandas as pd

        def _i(x):
            # NULL dims arrive as pandas NaN floats; a non-null pixel
            # row with hostile NULL dims must hash to None via the
            # size-mismatch gate, not kill the task on int(NaN)
            return 0 if x is None or x != x else int(x)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": [
                        dhash64(
                            bytes(p) if p is not None else None,
                            _i(w), _i(h), _i(c), grid=grid,
                        )
                        for p, w, h, c in zip(
                            pdf["pixels"], pdf["width"],
                            pdf["height"], pdf["channels"],
                        )
                    ],
                }
            )

    cols = ["media_id", "width", "height", "channels", "pixels"]
    return decoded.select(*cols).mapInPandas(_hash, HASH_SCHEMA)


def dhash_near_dups(hashes: DataFrame, max_hamming: int = 4,
                    bands: int | None = None) -> DataFrame:
    """Near-duplicate image pairs (id_a < id_b, hamming <= max_hamming)
    from an (media_id, dhash) relation — banded equi-join, EXACT recall.

    ``bands`` defaults to ``max_hamming + 1``: any pair within
    ``max_hamming`` differing bits has, by pigeonhole, at least one of
    the ``bands`` 64/bands-bit slices identical, so the slice-keyed
    equi-join meets every true pair; ``bit_count`` on the XOR then
    filters to the exact set.  All candidate work is JVM-side (explode,
    shuffle on (band, key), bit arithmetic) — the plan carries no
    cartesian product and no Python in the pair path.  Shuffle volume
    is bands x |images| 16-byte rows for candidates, bounded by true
    near-dup density for pairs — the MinHash-LSH scale argument
    verbatim (dedup.py), minus the probabilistic recall caveat."""
    if bands is None:
        bands = max_hamming + 1
    if not 1 <= bands <= 64:
        raise ValueError(f"bands must be in [1, 64], got {bands}")
    if max_hamming >= bands:
        raise ValueError(
            f"exact recall needs bands > max_hamming (pigeonhole): "
            f"got bands={bands}, max_hamming={max_hamming}"
        )
    width = 64 // bands  # last band absorbs the remainder bits

    def band_key(b: int):
        # unsigned slice: shift then mask; the last band's mask spans
        # the remainder so all 64 bits are keyed.  A >=64-bit slice
        # (bands=1) is the hash itself — a 2^64-1 literal would
        # overflow LongType.
        shifted = F.shiftrightunsigned(F.col("dhash"), b * width)
        nbits = (64 - b * width) if b == bands - 1 else width
        if nbits >= 64:
            return shifted
        return shifted.bitwiseAND(F.lit((1 << nbits) - 1).cast("long"))

    h = hashes.where(F.col("dhash").isNotNull())
    keyed = h.select(
        "media_id",
        "dhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    band_key(b).alias("key"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("media_id", "dhash", "bk.band", "bk.key")
    a, b_ = keyed.alias("a"), keyed.alias("b")
    pairs = (
        a.join(
            b_,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.key") == F.col("b.key"),
                F.col("a.media_id") < F.col("b.media_id"),
            ],
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.bit_count(
                F.col("a.dhash").bitwiseXOR(F.col("b.dhash"))
            ).alias("hamming"),
        )
        # a pair can match in several bands: dedup BEFORE any consumer
        # fans out (distinct on the 3 output columns — hamming is
        # functionally dependent on the pair, so this is pair-distinct)
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


def dhash_clusters(hashes: DataFrame) -> DataFrame:
    """(media_id, dhash, cluster_rep) — exact-hash clustering: every
    image joins the cluster of the minimum media_id sharing its hash.

    This is the pair-blowup guard for :func:`dhash_near_dups` at scale:
    a corpus with a million copies of one image has ~5e11 hamming-0
    PAIRS (quadratic, like any pairwise dedup) but only one cluster
    row per member (linear).  The scalable composition is therefore
    cluster first, then run the banded pair join on the one
    representative per hash (``cluster_rep == media_id``) — identical
    hashes are trivially near-dups of each other, and near-dupness
    against the rest of the corpus depends only on the hash, so
    nothing is lost.  One map-side-combinable groupBy, no join."""
    from pyspark.sql import Window

    w = Window.partitionBy("dhash")
    return (
        hashes.where(F.col("dhash").isNotNull())
        .withColumn("cluster_rep", F.min("media_id").over(w))
    )


def near_dup_images(decoded: DataFrame, max_hamming: int = 4,
                    grid: int = 8) -> DataFrame:
    """decode_pixels output -> exact near-dup pairs: the composed
    hash-then-band chain, one line for pipeline callers.

    At 100 TB compose through :func:`dhash_clusters` instead when the
    corpus carries heavy exact duplication (crawl data always does):
    pairwise output over k identical images is k^2/2 rows by
    definition — cluster the exact-hash groups linearly first and band
    only the representatives."""
    return dhash_near_dups(image_dhash(decoded, grid=grid),
                           max_hamming=max_hamming)


def pixel_feature_vec(pixels: bytes, width: int, height: int,
                      channels: int, thumb: int = 4):
    """Dependency-free image embedding from one decoded raster, or
    None for degenerate inputs: a thumb x thumb contrast-normalized
    luma thumbnail (shape/structure; brightness- and contrast-
    invariant) followed by per-channel mean and std over 255
    (global color statistics).  Length ``thumb*thumb + 6``; single-
    channel images replicate their one channel across the color
    slots."""
    import numpy as np

    if not 1 <= thumb <= 16:
        raise ValueError(f"thumb must be in [1, 16], got {thumb}")
    if pixels is None or not width or not height or not channels:
        return None
    if width < thumb or height < thumb:
        return None  # fewer pixels than cells: nothing to fingerprint
    arr = _raster_array(pixels, width, height, channels)
    if arr is None:
        return None
    cells = _area_mean(_to_luma(arr), thumb, thumb).ravel()
    sd = cells.std()
    norm = (cells - cells.mean()) / (sd + 1e-6)
    nch = min(channels, 3)
    stats = []
    for c in range(3):
        ch = arr[:, :, min(c, nch - 1)]
        stats.append(ch.mean() / 255.0)
    for c in range(3):
        ch = arr[:, :, min(c, nch - 1)]
        stats.append(ch.std() / 255.0)
    return [float(x) for x in norm] + [float(s) for s in stats]


def pixel_features(decoded: DataFrame, thumb: int = 4) -> DataFrame:
    """(media_id, embedding) from :func:`multimodal.decode_pixels`
    output — the decode -> embedding bridge: the emitted
    ``array<float>`` plugs directly into the ANN / semantic-dedup
    operators (``similarity.cosine_topk(..., id_col='media_id',
    vec_col='embedding')``, ``embedding_near_duplicates``,
    ``semantic_dedup``), so the whole vector toolbox applies to
    images without a model in the loop.  Same distributed shape as
    the hash pass: Arrow-batched ``mapInPandas``, pixels consumed
    in-stage and never shuffled, only ``thumb*thumb + 6`` floats per
    row leave; quarantined/degenerate rows keep a NULL embedding
    (drop them with ``similarity.valid_vectors`` before indexing, as
    with any embedding relation)."""
    if not 1 <= thumb <= 16:
        raise ValueError(f"thumb must be in [1, 16], got {thumb}")

    def _feats(batches):
        import pandas as pd

        def _i(x):
            return 0 if x is None or x != x else int(x)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "embedding": [
                        pixel_feature_vec(
                            bytes(p) if p is not None else None,
                            _i(w), _i(h), _i(c), thumb=thumb,
                        )
                        for p, w, h, c in zip(
                            pdf["pixels"], pdf["width"],
                            pdf["height"], pdf["channels"],
                        )
                    ],
                }
            )

    cols = ["media_id", "width", "height", "channels", "pixels"]
    return decoded.select(*cols).mapInPandas(_feats, FEATURES_SCHEMA)
