"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus a typed metadata struct;
per-item decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas iterators (``mapInPandas``) so bytes never pass
through row-at-a-time Python.

The decode kernels themselves are STUBS in this environment (no
PIL/ffmpeg in the container): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (bytes -> pseudo dimensions/features) runs
so the Spark-side plumbing — schema, batching, partitioning — is real
and testable.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def attach_binary(df: DataFrame, text_col: str, id_col: str, kind: str = "image") -> DataFrame:
    """Build a media DataFrame from any source column (test harness:
    encode text bytes as the opaque payload)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, checksum string, "
    "width int, height int, feat array<double>"
)


def _fake_decode(content: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real image decoder: derives pseudo
    dimensions and an 8-dim feature vector from the byte histogram."""
    n = len(content)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    hist = [0.0] * 8
    for b in content[:4096]:
        hist[b % 8] += 1.0
    total = sum(hist) or 1.0
    return width, height, [h / total for h in hist]


def decode_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + featurize media rows via ``mapInPandas``.

    Real decoders (PIL / torchaudio / ffmpeg) are not present in this
    container; with ``fake=False`` this raises ``NotImplementedError``
    at plan time to make the stub explicit.
    """
    if not fake:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg — not available in this environment; "
            "pass fake=True for the deterministic stub decoder"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = []
            for mid, kind, content in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                content = bytes(content) if content is not None else b""
                w, h, feat = _fake_decode(content)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "n_bytes": len(content),
                        "checksum": hashlib.md5(content).hexdigest(),
                        "width": w,
                        "height": h,
                        "feat": feat,
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "n_bytes", "checksum", "width", "height", "feat"])

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """Video-style frame sampling stub: emit one row per sampled offset
    (plumbing for 1->N mapInPandas expansion; a real impl would seek
    keyframes). Pure column expressions — no Python needed here."""
    offsets = F.slice(
        F.sequence(F.lit(0), F.greatest((F.length("content") - 1), F.lit(0)), F.lit(every_n_bytes)),
        1,
        max_frames,
    )
    return df.select(
        "media_id",
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )
