"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata (100 TB extension).

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake, or NotImplementedError for the real path) — but the
Spark-side plumbing is real and tested: schema, Arrow batch shape through
``mapInPandas``, partition sizing.

Scale notes: binary payloads dominate partition size — size
``spark.sql.files.maxPartitionBytes`` so one task holds a few hundred
media blobs, and NEVER collect payloads to the driver. Feature extraction
is an Arrow-batched pandas iterator: each batch arrives as a pandas
DataFrame with a ``bytes`` column, exactly how a real decoder (PIL/ffmpeg)
would consume it.
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
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("feat_mean", T.DoubleType(), True),
        T.StructField("feat_std", T.DoubleType(), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a media table from any string column: payload = utf-8 bytes,
    meta derived deterministically. Stands in for spark.read of real blobs
    (binaryFile source) in this codec-less container."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            (F.length(F.col(text_col)) % 1024).cast("int").alias("width"),
            (F.length(F.col(text_col)) % 768).cast("int").alias("height"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _try_import_pil():
    """Optional codec: PIL if installed, else None (this container has no
    codec libs — the stub branch stays the default and is always tested;
    the real branch activates automatically where PIL exists)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


PIL_IMAGE = _try_import_pil()


def decode_real(payload: bytes) -> "tuple[bytes, int, int]":
    """Real decode path: image bytes → (raw RGB bytes, width, height).

    Uses PIL when importable (any format); PNG payloads decode through
    the dependency-free pure-Python codec (``operators.png_codec``) so
    the real branch executes even in this codec-less container; anything
    else raises NotImplementedError (the deterministic ``fake=True`` stub
    is the supported bulk path without codecs)."""
    if PIL_IMAGE is not None:
        import io

        img = PIL_IMAGE.open(io.BytesIO(payload)).convert("RGB")
        return img.tobytes(), img.width, img.height
    from presencia_etl_spark.operators import png_codec

    if png_codec.is_png(payload):
        return png_codec.decode_png(payload)
    raise NotImplementedError(
        "media decoding beyond PNG requires PIL/ffmpeg, not present in "
        "this container; use fake=True for the deterministic stub"
    )


def _fake_features(payload: bytes) -> tuple[float, float]:
    """Deterministic stand-in for pixel statistics: byte-value mean/std
    (numpy-vectorized — a real decoder would be array-based the same way)."""
    if not payload:
        return 0.0, 0.0
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    return float(arr.mean()), float(arr.std())


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas.

    The iterator signature and batch shape are exactly what a real decoder
    needs; only the per-blob function is stubbed.
    """

    def featurize(p) -> tuple[float, float]:
        raw = bytes(p or b"")
        if not fake:
            raw, _w, _h = decode_real(raw)  # PIL pixels, or NotImplementedError
        return _fake_features(raw)  # byte/pixel mean+std — same math both ways

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(featurize)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p or b"")).astype("int64"),
                    "checksum": pdf["payload"].map(
                        lambda p: hashlib.md5(bytes(p or b"")).hexdigest()
                    ),
                    "feat_mean": feats.map(lambda t: round(t[0], 4)),
                    "feat_std": feats.map(lambda t: round(t[1], 4)),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def resize_media(
    media: DataFrame, target_width: int = 64, target_height: int = 48, fake: bool = True
) -> DataFrame:
    """Resize pass over mapInPandas — same schema in and out, shrunk
    payload + updated meta.

    The real path needs an image codec (stubbed, like decode); the fake
    path deterministically downsamples the byte stream by striding, which
    preserves the plumbing contract a real resizer has: payload shrinks,
    meta dimensions update, schema is stable, and everything happens
    executor-side in Arrow batches.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target_bytes = target_width * target_height
        for pdf in batches:
            out_payload = []
            out_meta = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                raw = bytes(payload or b"")
                if not fake:
                    if PIL_IMAGE is not None:
                        # Real branch: decode → PIL resize → raw RGB out.
                        import io

                        img = PIL_IMAGE.open(io.BytesIO(raw)).convert("RGB")
                        shrunk = img.resize(
                            (target_width, target_height)
                        ).tobytes()
                    else:
                        # Same contract without PIL: PNG via the pure-
                        # Python codec + nearest-neighbor resample (other
                        # formats raise the canonical NotImplementedError
                        # inside decode_real).
                        from presencia_etl_spark.operators import png_codec

                        rgb, w, h = decode_real(raw)
                        shrunk = png_codec.resize_rgb_nearest(
                            rgb, w, h, target_width, target_height
                        )
                    fmt_suffix = ";resized-rgb"
                else:
                    stride = max(1, len(raw) // target_bytes) if raw else 1
                    shrunk = raw[::stride][:target_bytes]
                    fmt_suffix = ";resized"
                out_payload.append(shrunk)
                m = dict(meta) if meta is not None else {}
                m.update(
                    format=(m.get("format") or "fake/raw") + fmt_suffix,
                    width=target_width,
                    height=target_height,
                    n_bytes=len(shrunk),
                )
                out_meta.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payload,
                    "meta": out_meta,
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' over the opaque payload: slice every Nth byte window
    — JVM-side (substring over binary cast), demonstrating how video frame
    extraction parallelizes without Python."""
    return media.select(
        "media_id",
        F.expr(
            f"transform(sequence(0, least(int(meta.n_bytes / {every_n_bytes}), {max_frames - 1})),"
            f" i -> substring(payload, i * {every_n_bytes} + 1, {every_n_bytes}))"
        ).alias("frames"),
    ).withColumn("n_frames", F.size("frames"))
