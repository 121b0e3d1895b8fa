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


def _wav_bytes(freq_hz=440.0, seconds=0.5, rate=8000, nch=1, amplitude=0.5):
    """Synthesize a PCM16 WAV entirely with the stdlib (the same module
    the decoder uses, but through the public writer API)."""
    import io
    import math
    import struct
    import wave

    n = int(seconds * rate)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = bytearray()
        for i in range(n):
            v = int(amplitude * 32767 * math.sin(2 * math.pi * freq_hz * i / rate))
            frames += struct.pack("<h", v) * nch
        w.writeframes(bytes(frames))
    return buf.getvalue()


def test_decode_audio_wav_real(spark):
    """Real WAV decode via stdlib wave: a 440 Hz sine at 8 kHz has
    RMS ~ amp/sqrt(2), ZCR ~ 2*f/rate, and exact container params."""
    from batch_process_spark.operators.multimodal import decode_audio_features

    sine = _wav_bytes(freq_hz=440.0, seconds=0.5, rate=8000)
    silence = _wav_bytes(amplitude=0.0, seconds=0.25, rate=16000, nch=2)
    df = spark.createDataFrame(
        [(1, sine), (2, silence), (3, b"not a wav")],
        "media_id long, content binary",
    )
    out = {r["media_id"]: r for r in decode_audio_features(df).collect()}

    s = out[1]
    assert (s["sample_rate"], s["n_channels"], s["n_frames"]) == (8000, 1, 4000)
    assert s["duration_ms"] == 500 and s["error"] is None
    assert abs(s["rms"] - 0.5 / 2**0.5) < 0.01
    assert abs(s["zero_cross_rate"] - 2 * 440 / 8000) < 0.01
    assert 0.49 < s["peak"] <= 0.5

    q = out[2]
    assert (q["sample_rate"], q["n_channels"]) == (16000, 2)
    assert q["rms"] == 0.0 and q["peak"] == 0.0 and q["duration_ms"] == 250

    bad = out[3]
    assert bad["error"] is not None and bad["sample_rate"] is None
