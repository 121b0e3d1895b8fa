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


def test_decode_real_rejects_unknown_container_without_pillow(media):
    from batch_process_spark.operators.multimodal import pil_available

    if pil_available():
        pytest.skip("Pillow present; real branch covered below")
    # the media fixture's payloads are raw text bytes, not PNG/BMP: the
    # stdlib real decoder must refuse them loudly (mid-job, since the
    # decoder is picked per task), naming the Pillow escape hatch
    with pytest.raises(Exception, match="Pillow"):
        decode_features(media, fake=False).collect()


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


# ---------------------------------------------------------------------------
# stdlib image header parse (no Pillow): real container bytes
# ---------------------------------------------------------------------------


def _png_bytes(w, h):
    import struct, zlib

    def chunk(tag, payload):
        return struct.pack(">I", len(payload)) + tag + payload + struct.pack(
            ">I", zlib.crc32(tag + payload) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")


def _jpeg_bytes(w, h):
    import struct

    # SOI, APP0 (JFIF), a COM segment the walker must skip, SOF0, EOI
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + com + sof0 + b"\xff\xd9"


def _gif_bytes(w, h):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6


def _bmp_bytes(w, h):
    import struct

    # 14-byte file header, then BITMAPINFOHEADER (DIB size 40) + dims
    return (
        b"BM" + b"\x00" * 12 + struct.pack("<I", 40) + struct.pack("<ii", w, h) + b"\x00" * 10
    )


def test_parse_image_header_all_containers():
    from batch_process_spark.operators.multimodal import _parse_image_header

    assert _parse_image_header(_png_bytes(640, 480)) == ("png", 640, 480)
    assert _parse_image_header(_jpeg_bytes(123, 456)) == ("jpeg", 123, 456)
    assert _parse_image_header(_gif_bytes(320, 200)) == ("gif", 320, 200)
    assert _parse_image_header(_bmp_bytes(800, 600)) == ("bmp", 800, 600)
    # top-down BMP stores negative height; dims reported positive
    assert _parse_image_header(_bmp_bytes(800, -600)) == ("bmp", 800, 600)


def test_parse_image_header_rejects_garbage():
    import struct

    from batch_process_spark.operators.multimodal import _parse_image_header

    # OS/2 BITMAPCOREHEADER: u16 dims at different offsets — decoding it
    # with the i32 layout would return garbage, so it must error instead
    core_bmp = (
        b"BM" + b"\x00" * 12 + struct.pack("<I", 12) + struct.pack("<HH", 100, 100) + b"\x00" * 8
    )
    for bad in (b"", b"not an image", _png_bytes(1, 1)[:10], b"\xff\xd8\xff\xd9", core_bmp):
        with pytest.raises(ValueError):
            _parse_image_header(bad)


def test_parse_image_meta_errors_as_data(spark):
    from batch_process_spark.operators.multimodal import parse_image_meta

    rows = [
        (1, _png_bytes(32, 64)),
        (2, _jpeg_bytes(100, 50)),
        (3, b"corrupt shard"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r for r in parse_image_meta(df).collect()}
    assert (out[1]["format"], out[1]["width"], out[1]["height"]) == ("png", 32, 64)
    assert (out[2]["format"], out[2]["width"], out[2]["height"]) == ("jpeg", 100, 50)
    assert out[3]["format"] is None and "ValueError" in out[3]["error"]
    assert out[4]["error"] is not None  # NULL payload -> error row, not a crash
    assert out[1]["error"] is None


def test_synth_png_roundtrip_and_pillow_agreement(spark):
    """synth_png emits REAL containers: our parser recovers the dims,
    and — when Pillow exists — PIL agrees on the same bytes."""
    from batch_process_spark.operators.multimodal import (
        parse_image_meta,
        pil_available,
        synth_png,
    )

    src = spark.createDataFrame([(7, 20, 30), (8, 64, 16)], "doc_id long, w int, h int")
    media = synth_png(src, "doc_id", "w", "h")
    out = {r["media_id"]: r for r in parse_image_meta(media).collect()}
    assert (out[7]["width"], out[7]["height"]) == (20, 30)
    assert (out[8]["width"], out[8]["height"]) == (64, 16)
    if pil_available():
        import io

        from PIL import Image

        payload = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
        with Image.open(io.BytesIO(payload[7])) as im:
            assert im.size == (20, 30)


def _png_pixel_bytes(pixels, ctype, filters=None, plte=None):
    """Build a real PNG from a row-major list of per-pixel tuples (or
    ints for gray), choosing the per-scanline filter types — so the
    unfiltering paths are exercised against KNOWN pixel values."""
    import struct
    import zlib

    h = len(pixels)
    w = len(pixels[0])
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    filters = filters or [0] * h

    def flat(row):
        out = bytearray()
        for px in row:
            out.extend(bytes([px]) if isinstance(px, int) else bytes(px))
        return out

    def filt(f, cur, prev):
        out = bytearray()
        for i, x in enumerate(cur):
            a = cur[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            if f == 0:
                out.append(x)
            elif f == 1:
                out.append((x - a) & 0xFF)
            elif f == 2:
                out.append((x - b) & 0xFF)
            elif f == 3:
                out.append((x - ((a + b) >> 1)) & 0xFF)
            else:  # paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out.append((x - pr) & 0xFF)
        return out

    raw = bytearray()
    prev = bytearray(w * nch)
    for f, row in zip(filters, pixels):
        cur = flat(row)
        raw.append(f)
        raw.extend(filt(f, cur, prev))
        prev = cur

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    png = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    )
    if plte is not None:
        png += chunk(b"PLTE", bytes(plte))
    return png + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


def _bmp_pixel_bytes(pixels_rgb, bpp=24):
    """Real uncompressed bottom-up BMP from row-major RGB tuples."""
    import struct

    h = len(pixels_rgb)
    w = len(pixels_rgb[0])
    nb = bpp // 8
    stride = ((w * nb + 3) // 4) * 4
    body = bytearray()
    for row in reversed(pixels_rgb):  # bottom-up
        line = bytearray()
        for r, g, b in row:
            line.extend((b, g, r) if nb == 3 else (b, g, r, 0xFF))
        line.extend(b"\x00" * (stride - len(line)))
        body += line
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(body), 2835, 2835, 0, 0)
    return bytes(hdr + dib + body)


def test_stdlib_png_decode_all_filters_known_histogram():
    """Real PNG pixels through every filter type (0-4): the stdlib
    decoder must recover EXACT dimensions and the exact 8-bin gray
    histogram computed independently from the source pixel array."""
    from batch_process_spark.operators.multimodal import _stdlib_decode

    # 5 rows x 4 cols of RGB with spread intensities; one row per filter
    pixels = [
        [((r * 40 + c * 17) % 256, (r * 90 + c * 31) % 256, (r * 13 + c * 77) % 256)
         for c in range(4)]
        for r in range(5)
    ]
    png = _png_pixel_bytes(pixels, ctype=2, filters=[0, 1, 2, 3, 4])
    w, h, feat = _stdlib_decode(png)
    assert (w, h) == (4, 5)
    expect = [0.0] * 8
    for row in pixels:
        for r, g, b in row:
            # Pillow's fixed-point L24 luma (truncating >> 16), which
            # _luma must match bit-for-bit — not the documented /1000
            expect[((r * 19595 + g * 38470 + b * 7471) >> 16) >> 5] += 1.0
    expect = [e / 20.0 for e in expect]
    assert feat == pytest.approx(expect, abs=1e-12)


def test_stdlib_png_gray_and_palette_variants():
    from batch_process_spark.operators.multimodal import _stdlib_decode

    gray = [[(i * 5 + j * 50) % 256 for j in range(6)] for i in range(3)]
    w, h, feat = _stdlib_decode(_png_pixel_bytes(gray, ctype=0, filters=[0, 2, 1]))
    assert (w, h) == (6, 3)
    expect = [0.0] * 8
    for row in gray:
        for v in row:
            expect[v >> 5] += 1.0
    assert feat == pytest.approx([e / 18.0 for e in expect], abs=1e-12)

    # paletted: indices 0..2 -> black / mid gray / white
    plte = [0, 0, 0, 128, 128, 128, 255, 255, 255]
    idx = [[0, 1, 2, 1], [2, 2, 0, 0]]
    w, h, feat = _stdlib_decode(_png_pixel_bytes(idx, ctype=3, plte=plte))
    assert (w, h) == (4, 2)
    assert feat[0] == pytest.approx(3 / 8)   # three black
    assert feat[4] == pytest.approx(2 / 8)   # two mid-gray (128 -> bin 4)
    assert feat[7] == pytest.approx(3 / 8)   # three white


def test_stdlib_bmp_decode_known_histogram():
    from batch_process_spark.operators.multimodal import _stdlib_decode

    pixels = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]
    for bpp in (24, 32):
        w, h, feat = _stdlib_decode(_bmp_pixel_bytes(pixels, bpp=bpp))
        assert (w, h) == (2, 2)
        lumas = [76, 149, 29, 255]  # PIL ITU-R 601-2 integer luma
        expect = [0.0] * 8
        for v in lumas:
            expect[v >> 5] += 0.25
        assert feat == pytest.approx(expect, abs=1e-12)


def test_decode_features_real_pixels_without_pillow(spark):
    """End-to-end Spark path: decode_features(fake=False) produces real
    intensity features from genuine PNG/BMP payloads with no decoder
    library installed — the executor-side stdlib fallback."""
    pngs = [(1, _png_pixel_bytes([[0, 255], [128, 64]], ctype=0)),
            (2, _bmp_pixel_bytes([[(255, 255, 255), (0, 0, 0)]]))]
    df = spark.createDataFrame(pngs, "media_id long, raw binary").select(
        "media_id",
        F.lit("image").alias("kind"),
        F.col("raw").alias("content"),
        F.lit(None)
        .cast("struct<mime:string,width:int,height:int,duration_ms:bigint>")
        .alias("meta"),
    )
    rows = {r["media_id"]: r for r in decode_features(df, fake=False).collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (2, 2)
    assert rows[1]["feat"][0] == pytest.approx(0.25)  # the 0 pixel
    assert rows[1]["feat"][7] == pytest.approx(0.25)  # the 255 pixel
    assert (rows[2]["width"], rows[2]["height"]) == (2, 1)
    assert rows[2]["feat"] == pytest.approx([0.5, 0, 0, 0, 0, 0, 0, 0.5])
    for r in rows.values():
        assert abs(sum(r["feat"]) - 1.0) < 1e-9


# --- round-8: Pillow parity for the decode kernels ----------------------

def test_pil_decode_agrees_with_png_decode_on_fixture():
    """_pil_decode and _png_decode must produce the SAME (width, height,
    8-bin luma histogram) for a PNG with known pixel values — the
    optional-dep decoder is a faster path, not a different feature
    definition. Skipped without Pillow (like the other optional-dep
    tests); the stdlib side of the contract is pinned regardless by
    test_png_decode_* above."""
    pytest.importorskip("PIL")
    from batch_process_spark.operators.multimodal import _pil_decode, _png_decode

    # 4x3 RGB gradient exercising several luma bins
    pixels = [
        [(0, 0, 0), (40, 40, 40), (90, 90, 90), (130, 130, 130)],
        [(160, 160, 160), (200, 200, 200), (255, 255, 255), (10, 200, 30)],
        [(250, 5, 5), (5, 5, 250), (128, 128, 0), (0, 128, 128)],
    ]
    png = _png_pixel_bytes(pixels, ctype=2)
    w_a, h_a, hist_a = _png_decode(png)
    w_b, h_b, hist_b = _pil_decode(png)
    assert (w_a, h_a) == (w_b, h_b) == (4, 3)
    assert hist_a == pytest.approx(hist_b, abs=1e-9), (hist_a, hist_b)


def test_pil_decode_jpeg_luma_histogram():
    """JPEG decode rides Pillow (the stdlib decoder refuses it by
    contract): dims recovered, 8-bin histogram normalized and
    concentrated where the luma actually is."""
    PIL = pytest.importorskip("PIL")  # noqa: N806
    import io

    from PIL import Image

    from batch_process_spark.operators.multimodal import _pil_decode

    buf = io.BytesIO()
    Image.new("RGB", (24, 16), (100, 100, 100)).save(buf, format="JPEG", quality=95)
    w, h, hist = _pil_decode(buf.getvalue())
    assert (w, h) == (24, 16)
    assert sum(hist) == pytest.approx(1.0)
    # uniform luma 100 lands in bin 3 (96..127); JPEG ringing may leak
    # a little into neighbors
    assert hist[3] > 0.9, hist


def test_stdlib_decode_refuses_jpeg_loudly():
    """Without a codec library the stdlib decoder must raise
    NotImplementedError naming Pillow for JPEG payloads — a capability
    guard, not a silent wrong answer. Runs in every environment."""
    from batch_process_spark.operators.multimodal import _stdlib_decode

    with pytest.raises(NotImplementedError, match="Pillow"):
        _stdlib_decode(_jpeg_bytes(10, 10))
