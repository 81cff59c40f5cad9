"""Multimodal column operators: opaque binary payloads + typed metadata.

Design (BASELINE.json north star): image/audio/video travel as
``binary`` columns with a metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` operators so a
100 TB corpus streams through Python in columnar batches, never row at a
time.  The image codec is capability-gated: ``decode_stub=False`` runs a
real Pillow decode (width/height/mean-luma/aHash), imported at call time;
``decode_stub=True`` produces deterministic fake features from a sha256
of the payload bytes (what the oracle gate recomputes); ``None``
auto-detects.  Either way the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is identical and tested.
Audio/video (librosa/av) remain fake-only in this container.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("phash", T.LongType()),
    ]
)


def _pillow_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _decode_image_real(payload: bytes) -> dict:
    """Real decode via Pillow, imported at call time (capability-gated:
    the library is optional and absent in some environments).  Features
    mirror the fake path's schema: dimensions, mean luma in [0,1], and a
    64-bit average-hash (aHash: 8x8 grayscale thumbnail thresholded at
    its own mean — the standard near-dup perceptual hash)."""
    import io

    try:
        import numpy as np
        from PIL import Image
    except ImportError as e:
        # No Pillow: PNG payloads still decode for REAL via the
        # stdlib-only codec; other formats need the library.
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return _decode_image_purepy(payload)
        raise ImportError(
            "Pillow is required for decode_stub=False on non-PNG "
            "payloads; install it or use decode_stub=True (deterministic "
            "fake) / decode_stub=None (auto-detect)"
        ) from e
    with Image.open(io.BytesIO(payload)) as im:
        width, height = im.size
        gray = im.convert("L")
        arr = np.asarray(gray, dtype=np.float64)
        small = np.asarray(
            gray.resize((8, 8), Image.Resampling.LANCZOS), dtype=np.float64
        )
    bits = (small > small.mean()).flatten()
    phash = 0
    for b in bits:
        phash = (phash << 1) | int(b)
    if phash >= 1 << 63:  # two's-complement into LongType
        phash -= 1 << 64
    return {
        "width": int(width),
        "height": int(height),
        "mean_luma": float(arr.mean() / 255.0),
        "phash": phash,
    }


def _decode_image_purepy(payload: bytes) -> dict:
    """Real PNG decode via the stdlib-only codec (png_codec.py) — the
    no-Pillow arm of the real-decode path.  Same feature contract as the
    Pillow arm: dimensions, mean luma in [0,1], 64-bit aHash.  The aHash
    thumbnail here is an 8x8 box average (vs Pillow's LANCZOS resample),
    so hash BITS differ across arms while the semantics — deterministic
    perceptual bucketing of the same image — are identical; never mix
    arms within one dedup corpus."""
    from financial_data_science_spark.functions.png_codec import decode, luma_rows

    width, height, channels, rows = decode(payload)
    luma = luma_rows(width, height, channels, rows)
    total = sum(sum(r) for r in luma)
    npx = width * height
    # 8x8 box-average thumbnail on integer cell boundaries (cells clamp
    # to >=1 pixel so tiny images still hash deterministically)
    cells = []
    for y in range(8):
        r0 = y * height // 8
        r1 = max((y + 1) * height // 8, r0 + 1)
        for x in range(8):
            c0 = x * width // 8
            c1 = max((x + 1) * width // 8, c0 + 1)
            acc = n = 0
            for yy in range(r0, min(r1, height)):
                seg = luma[yy][c0 : min(c1, width)]
                acc += sum(seg)
                n += len(seg)
            cells.append(acc / n if n else 0.0)
    thresh = sum(cells) / 64.0
    phash = 0
    for v in cells:
        phash = (phash << 1) | int(v > thresh)
    if phash >= 1 << 63:  # two's-complement into LongType
        phash -= 1 << 64
    return {
        "width": int(width),
        "height": int(height),
        "mean_luma": float(total / npx / 255.0),
        "phash": phash,
    }


def _decode_image_fake(payload: bytes) -> dict:
    """Deterministic fake decode: dimensions/luma/phash derived from a
    sha256 of the payload — stable across runs and partitionings."""
    h = hashlib.sha256(payload).digest()
    return {
        "width": 64 + h[0],
        "height": 64 + h[1],
        "mean_luma": h[2] / 255.0,
        "phash": int.from_bytes(h[3:11], "big", signed=True),
    }


def attach_payload_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JVM-side metadata that needs no decode: byte length + magic-number
    format sniff (first bytes of the payload)."""
    p = F.col(payload_col)
    magic = F.hex(F.substring(p, 1, 4))
    fmt = (
        F.when(magic.startswith("FFD8"), "jpeg")
        .when(magic == "89504E47", "png")
        .when(magic.startswith("52494646"), "riff")
        .otherwise("unknown")
    )
    return df.withColumn("n_bytes", F.octet_length(p).cast("long")).withColumn(
        "format", fmt
    )


def extract_image_features(
    media: DataFrame,
    decode_stub: bool | None = True,
    batch_repartition: int | None = None,
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    ``decode_stub``: True = deterministic fake features (what the oracle
    gate recomputes); False = real Pillow decode (ImportError with
    guidance if Pillow is absent); None = auto-detect — real decode when
    Pillow imports, fake otherwise.  The detection runs on the DRIVER so
    the chosen path is fixed before tasks ship (mixed executor installs
    would otherwise give split-brain features).

    ``batch_repartition`` spreads large payload rows before the Python
    stage (payload skew — a few huge videos — otherwise serializes one
    task); at scale pass ~2-3x cores.
    """
    if decode_stub is None:
        decode_stub = not _pillow_available()
    decode = _decode_image_fake if decode_stub else _decode_image_real

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "format", pdf["format"].values)
            out.insert(2, "n_bytes", pdf["n_bytes"].values)
            yield out

    src = media
    if batch_repartition:
        src = src.repartition(batch_repartition)
    return src.mapInPandas(op, IMAGE_FEATURE_SCHEMA)


def make_media_table(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Test harness: synthesize a binary media table from text payloads so
    the pipeline runs on the driver-provided documents fixture."""
    return attach_payload_metadata(
        docs.select(
            F.col(id_col).alias("media_id"),
            F.encode(F.col(text_col), "UTF-8").alias("payload"),
        )
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("byte_offset", T.LongType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    decode_stub: bool | None = True,
    fmt: str = "png",
) -> DataFrame:
    """Resize via ``mapInPandas`` — the normalize-resolution step of an
    image-training pipeline.  Real path (``decode_stub=False``): Pillow
    decode -> LANCZOS resize -> re-encode, imported at call time
    (capability-gated like extract_image_features).  Fake path: output
    payload = sha256(payload || 'WxH'), a deterministic 32-byte stand-in
    the SQL oracle recomputes byte-for-byte (sha2 in Spark, sha256 in
    DuckDB), so the Arrow plumbing and schema are gate-checked even
    where no codec exists.  ``None`` auto-detects on the driver."""
    if decode_stub is None:
        decode_stub = not _pillow_available()
    tag = f"{width}x{height}".encode()

    def fake(payload: bytes) -> bytes:
        return hashlib.sha256(bytes(payload) + tag).digest()

    def real(payload: bytes) -> bytes:
        import io

        from PIL import Image

        with Image.open(io.BytesIO(payload)) as im:
            out = im.resize((width, height), Image.Resampling.LANCZOS)
            buf = io.BytesIO()
            out.save(buf, format=fmt.upper())
            return buf.getvalue()

    resize = fake if decode_stub else real

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [resize(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "format": pdf["format"].values,
                    "width": width,
                    "height": height,
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return media.mapInPandas(op, RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame,
    frame_size: int = 256,
    stride: int = 4,
    max_frames: int = 8,
) -> DataFrame:
    """Frame sampling for opaque video-ish payloads: emit every
    ``stride``-th ``frame_size``-byte chunk, up to ``max_frames`` per
    payload — the 1->N row fan-out shape of real video frame extraction
    (one input row becomes a bounded set of frame rows inside the same
    Arrow batch; downstream per-frame operators parallelize over rows).

    A real container demuxer (PyAV) is absent in this environment, so the
    chunk slicer IS the deterministic decode here — but byte slicing is
    also exactly what the SQL oracle can replay (substring on the blob),
    which makes the fan-out plumbing gate-checkable.  Swap ``_slice`` for
    a demuxer without touching schema or partitioning."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, frames = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(payload)
                n_chunks = (len(p) + frame_size - 1) // frame_size
                i = 0
                while i * stride < n_chunks and i < max_frames:
                    off = i * stride * frame_size
                    ids.append(mid)
                    idxs.append(i)
                    offs.append(off)
                    frames.append(p[off : off + frame_size])
                    i += 1
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "byte_offset": pd.array(offs, dtype="int64"),
                    "frame": frames,
                    "n_bytes": pd.array(
                        [len(f) for f in frames], dtype="int64"
                    ),
                }
            )

    return media.mapInPandas(op, FRAME_SCHEMA)
