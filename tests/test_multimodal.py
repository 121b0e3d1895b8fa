"""Multimodal column plumbing tests (schema, batching, stub decode)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from batch_process_spark.operators.multimodal import (
    attach_binary,
    decode_features,
    frame_sample,
)


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame([(1, "hello media"), (2, "x" * 5000)], "doc_id long, text string")
    return attach_binary(df, "text", "doc_id", kind="image")


def test_media_schema(media):
    assert media.columns == ["media_id", "kind", "content", "meta"]
    row = media.filter(F.col("media_id") == 1).collect()[0]
    assert bytes(row["content"]) == b"hello media"
    assert row["meta"]["mime"] == "application/octet-stream"


def test_decode_features_checksum_and_dims(media):
    out = {r["media_id"]: r for r in decode_features(media, fake=True).collect()}
    assert out[1]["checksum"] == hashlib.md5(b"hello media").hexdigest()
    assert out[1]["n_bytes"] == 11
    assert out[1]["width"] == 16 + 11 % 64
    assert len(out[1]["feat"]) == 8
    assert abs(sum(out[1]["feat"]) - 1.0) < 1e-9


def test_decode_real_is_explicit_stub_without_pillow(media):
    from batch_process_spark.operators.multimodal import pil_available

    if pil_available():
        pytest.skip("Pillow present; real branch covered below")
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_features(media, fake=False)


def test_decode_real_images_with_pillow(spark):
    PIL = pytest.importorskip("PIL")  # noqa: N806
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (20, 10), color=(255, 0, 0)).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame([(1, png)], "media_id long, raw binary").select(
        "media_id",
        F.lit("image").alias("kind"),
        F.col("raw").alias("content"),
        F.lit(None)
        .cast("struct<mime:string,width:int,height:int,duration_ms:bigint>")
        .alias("meta"),
    )
    row = decode_features(df, fake=False).collect()[0]
    assert (row["width"], row["height"]) == (20, 10)
    assert len(row["feat"]) == 8 and abs(sum(row["feat"]) - 1.0) < 1e-9


def test_frame_sample_expansion(media):
    out = frame_sample(media, every_n_bytes=1024, max_frames=8)
    counts = {r["media_id"]: r["n"] for r in out.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts[1] == 1  # 11 bytes -> one offset
    assert counts[2] == 5  # 5000 bytes / 1024 -> offsets 0,1024,...,4096
