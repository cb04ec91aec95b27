"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Decode is split at the line the formats themselves draw:

  * ``decode_metadata(decoder="real")`` performs REAL container-header
    decode, stdlib-only — PNG/JPEG/GIF/BMP dimensions and channel
    counts parsed from the header bytes (``_real_dims``), unknown or
    torn headers quarantined as NULL-metadata rows.  Header parsing
    never decompresses pixels, which is exactly how a 100 TB metadata
    pass works in production.
  * PIXEL decode (DCT/inflate to raster) requires codec libraries not
    present in this container — ``decode_pixels`` raises
    NotImplementedError and documents where the codec call slots in.
  * ``decoder="fake"`` (the default, and what the synthetic testdata
    exercises — its payloads are utf-8 text, not image containers)
    derives deterministic metadata/features from md5(payload).

Everything around that split is real, scale-correct Spark:

  * typed schema: (media_id, kind, payload BINARY, meta STRUCT);
  * Arrow-batched ``mapInPandas`` with bounded batch size — payloads
    never materialize on the driver and each task processes a bounded
    byte volume;
  * explode-style frame sampling keeps per-row output width constant.

At 100 TB the payload column dominates I/O: keep it in its own parquet
column (columnar pruning skips it unless selected) and size
``spark.sql.files.maxPartitionBytes`` so a task's batch of payloads fits
executor memory.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<source:string,n_bytes:long>"
)

DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, channels int, "
    "n_bytes long"
)

FEATURES_SCHEMA = "media_id long, feature array<float>"

FRAMES_SCHEMA = "media_id long, frame_index int, frame_payload binary"

AUDIO_SCHEMA = (
    "media_id long, kind string, sample_rate int, channels int, "
    "bits int, n_frames long, n_bytes long"
)


def documents_as_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Adapter: wrap the synthetic documents table as a media table
    (payload = utf-8 bytes of text) so the plumbing is testable without
    real binaries."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic pseudo-decode: dimensions derived from md5(payload)."""
    h = hashlib.md5(payload).digest()
    width = 64 + int.from_bytes(h[0:2], "big") % 1960
    height = 64 + int.from_bytes(h[2:4], "big") % 1960
    channels = 1 + h[4] % 4
    return width, height, channels


#: PNG color type → sample channels (PNG spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _real_dims(payload: bytes):
    """REAL image-header decode, stdlib-only: (width, height, channels)
    parsed from the container header of the four standard image formats
    — PNG (IHDR), JPEG (SOF segment walk), GIF (logical screen
    descriptor), BMP (BITMAPINFOHEADER).  Returns (None, None, None)
    for unknown magic or a torn/truncated header — the corrupt row
    keeps NULL metadata instead of failing the task, the same
    quarantine contract as NULL payloads.

    This is how a 100 TB media-metadata table is actually built: the
    dimensions live in the first few hundred bytes of every container,
    so metadata extraction never DECOMPRESSES pixel data — it reads
    headers at I/O speed.  Pixel decode (DCT/inflate/colorspace) is the
    one step that genuinely needs codec libraries absent from this
    container, and remains gated (decode_pixels below)."""
    import struct

    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            # IHDR is mandatory-first: width/height big-endian at 16,
            # bit depth at 24, color type at 25
            w, h = struct.unpack(">II", payload[16:24])
            return w, h, _PNG_CHANNELS.get(payload[25])
        if payload[:2] == b"\xff\xd8":  # JPEG SOI; walk the segments
            i = 2
            while i + 9 < len(payload):
                if payload[i] != 0xFF:
                    return None, None, None  # torn segment stream
                marker = payload[i + 1]
                if marker == 0xFF:
                    i += 1  # fill byte padding before a marker
                    continue
                if marker == 0xD9:  # EOI before any SOF
                    return None, None, None
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone markers carry no length
                    continue
                seglen = struct.unpack(">H", payload[i + 2:i + 4])[0]
                # SOF0-SOF15 minus DHT/JPG/DAC hold the frame header
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                    return w, h, payload[i + 9]
                i += 2 + seglen
            return None, None, None
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", payload[6:10])
            return w, h, 3  # palette entries are RGB
        if payload[:2] == b"BM":
            w, h, _planes, bits = struct.unpack("<iihH", payload[18:30])
            return w, abs(h), max(1, bits // 8)  # h<0 = top-down DIB
    except (struct.error, IndexError):
        return None, None, None
    return None, None, None  # unknown container


def _wav_meta(payload: bytes):
    """REAL WAV (RIFF/WAVE) header decode, stdlib-only: walk the chunk
    stream for 'fmt ' (channels, sample rate, bit depth) and 'data'
    (frame count = chunk size / block align).  Chunk sizes are padded
    to even offsets per the RIFF spec.  Returns (sample_rate, channels,
    bits, n_frames) or all-None for unknown magic / torn headers —
    the same NULL-row quarantine contract as :func:`_real_dims`."""
    import struct

    none = (None, None, None, None)
    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return none
        i = 12
        rate = ch = bits = block = None
        n_frames = None
        while i + 8 <= len(payload):
            tag = payload[i:i + 4]
            size = struct.unpack("<I", payload[i + 4:i + 8])[0]
            if tag == b"fmt ":
                _fmt, ch, rate, _br, block, bits = struct.unpack(
                    "<HHIIHH", payload[i + 8:i + 24])
            elif tag == b"data":
                if block:  # fmt is spec-required to precede data
                    n_frames = size // block
            i += 8 + size + (size & 1)  # RIFF even-padding rule
        if rate is None:
            return none
        return rate, ch, bits, n_frames
    except (struct.error, IndexError):
        return none


def _fake_audio_meta(payload: bytes):
    h = hashlib.md5(payload).digest()
    rate = (8000, 16000, 22050, 44100, 48000)[h[0] % 5]
    ch = 1 + h[1] % 2
    bits = (8, 16, 24)[h[2] % 3]
    return rate, ch, bits, int.from_bytes(h[3:6], "big")


def decode_audio_metadata(media: DataFrame,
                          decoder: str = "fake") -> DataFrame:
    """Audio twin of :func:`decode_metadata`: payloads →
    (sample_rate, channels, bits, n_frames, n_bytes), Arrow-batched
    ``mapInPandas``, no shuffle, NULL-payload/undecodable rows
    quarantined with NULL metadata.  ``decoder="real"`` performs real
    RIFF/WAVE header decode (:func:`_wav_meta` — genuinely valid for
    anything the stdlib ``wave`` module writes); compressed codecs
    (MP3/OGG/FLAC frames) are the pixel-decode analogue and stay out
    of scope.  ``decoder="fake"`` md5-derives the fields so the
    synthetic testdata (utf-8 payloads) exercises the plumbing."""

    def _decode(batches):
        import pandas as pd

        meta_of = _wav_meta if decoder == "real" else _fake_audio_meta
        for pdf in batches:
            metas = [
                meta_of(bytes(p)) if p is not None else (None,) * 4
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "sample_rate": [m[0] for m in metas],
                    "channels": [m[1] for m in metas],
                    "bits": [m[2] for m in metas],
                    "n_frames": [m[3] for m in metas],
                    "n_bytes": [
                        len(bytes(p)) if p is not None else None
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(_decode, AUDIO_SCHEMA)


def decode_pixels(media: DataFrame):  # pragma: no cover - documented gate
    """Pixel-level decode (decompression to raster) requires codec
    libraries (PIL/libjpeg/ffmpeg) not present in this environment.
    The distributed shape it would use is exactly
    :func:`decode_metadata`'s (Arrow-batched mapInPandas, NULL-row
    quarantine, no shuffle) — slot the codec call into ``_decode``."""
    raise NotImplementedError(
        "pixel decode requires codec libraries not present in this "
        "environment; header metadata decode is decode_metadata("
        "decoder='real')"
    )


def decode_metadata(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode payloads to (width, height, channels) metadata.

    ``mapInPandas`` over the source partitions as-is — no shuffle.  Batch
    backpressure is the CALLER's conf, not this operator's side effect:
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` (an execution-time
    conf; default 10000 rows/batch) bounds each Arrow batch handed to
    ``_decode``, and ``spark.sql.files.maxPartitionBytes`` bounds
    per-task byte volume at the scan.  Set both session-wide when payload
    rows are large.  An earlier version set maxRecordsPerBatch inside
    this function — a session-global mutation that silently changed
    Arrow batching for every subsequent pandas-UDF query; and the
    version before that ``repartition``-ed the media relation "to size
    batches" — a full shuffle of every payload byte with zero semantic
    effect, a scale-killer at 100 TB.  Neither survives.
    """

    def _decode(batches):
        import pandas as pd

        dims_of = _real_dims if decoder == "real" else _fake_dims
        for pdf in batches:
            # NULL payload (corrupt/missing media — inevitable at 100 TB)
            # keeps its row with NULL metadata; bytes(None) would kill
            # the whole task, one bad row failing the job
            dims = [
                dims_of(bytes(p)) if p is not None else (None,) * 3
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                    "n_bytes": [
                        len(bytes(p)) if p is not None else None
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(_decode, DECODED_SCHEMA)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic fake featurizer: payload bytes → dim-float vector
    (md5-chained).  Real models slot in at the marked line; the Spark
    contract (schema, batching, no driver materialization) is final."""

    def _featurize(batches):
        import pandas as pd

        for pdf in batches:
            # NULL payloads have no feature vector: drop the row (the
            # metadata decoder keeps nulled rows; a featurizer's output
            # feeds similarity math where a null vector has no meaning)
            pdf = pdf[pdf["payload"].notna()]
            feats = []
            for p in pdf["payload"]:
                data = bytes(p)
                # <- real model inference goes here
                vec, seed = [], data
                while len(vec) < dim:
                    seed = hashlib.md5(seed).digest()
                    vec.extend(b / 255.0 - 0.5 for b in seed)
                feats.append([float(x) for x in vec[:dim]])
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats}
            )

    return media.mapInPandas(_featurize, FEATURES_SCHEMA)


def sample_text_frames(docs: DataFrame, every_n_chars: int = 64,
                       max_frames: int = 8, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Character-window frame sampling for TEXT media — the unicode-safe
    twin of :func:`sample_frames`: frames are CHARACTER windows on the
    decoded string (native substring arithmetic), where a byte chunk of
    UTF-8 can cut a multibyte character in half — fine for binary
    digests, but ``decode(chunk, 'utf-8')`` raises
    MALFORMED_CHARACTER_CODING on the torn edge (found by the
    messy-text oracle sweep).  Map-only, no Python, no shuffle; empty
    and NULL texts yield no frames (matching :func:`sample_frames`).
    Output: (media_id, frame_index, frame_text)."""
    n_frames = F.least(
        F.ceil(F.length(text_col) / every_n_chars).cast("int"),
        F.lit(max_frames),
    )
    return (
        docs.filter(F.length(text_col) > 0)
        .select(
            F.col(id_col).alias("media_id"),
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_index"),
            F.col(text_col),
        )
        .select(
            "media_id",
            "frame_index",
            F.expr(
                f"substring({text_col}, frame_index * {every_n_chars} + 1, "
                f"{every_n_chars})"
            ).alias("frame_text"),
        )
    )


def sample_frames(media: DataFrame, every_n_bytes: int = 64,
                  max_frames: int = 8) -> DataFrame:
    """Frame sampling for 'video' payloads: split the byte stream into
    fixed-size chunks and keep every chunk up to ``max_frames`` — pure
    native expressions (no Python), constant output width per row.

    NULL or zero-byte payloads yield NO frames: ``least`` and
    ``greatest`` SKIP null arguments, so the previous spelling gave a
    null payload ``least(NULL, max) = max`` frames of NULL bytes and an
    empty payload one empty frame (``greatest(-1, 0)``); after the
    length filter ``n_frames >= 1`` holds and neither clamp is needed.
    """
    n_frames = F.least(
        F.ceil(F.length("payload") / every_n_bytes).cast("int"),
        F.lit(max_frames),
    )
    idx = F.sequence(F.lit(0), n_frames - 1)
    return (
        media.filter(
            (F.col("kind") == "video") & (F.length("payload") > 0)
        )
        .select(
            "media_id",
            F.explode(idx).alias("frame_index"),
            F.col("payload"),
        )
        .select(
            "media_id",
            "frame_index",
            F.expr(
                f"substring(payload, frame_index * {every_n_bytes} + 1, "
                f"{every_n_bytes})"
            ).alias("frame_payload"),
        )
    )
