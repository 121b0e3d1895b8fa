"""Property tests for the stdlib image header parser: round-trips over
the full dimension domains, JPEG segment-walk robustness, and the
total-function contract (any byte blob either parses or raises
ValueError — never struct.error/IndexError, which would defeat the
errors-as-data wrapper's intent of labeling failures precisely).

No Spark needed: the kernel is a pure function.
"""

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from batch_process_spark.operators.multimodal import _parse_image_header

# container builders shared with the fixture tests — one definition of
# what a valid file looks like
from tests.test_multimodal import _bmp_bytes, _gif_bytes, _png_bytes as png_bytes


@given(w=st.integers(1, 2**31 - 1), h=st.integers(1, 2**31 - 1))
def test_png_roundtrip_full_domain(w, h):
    assert _parse_image_header(png_bytes(w, h)) == ("png", w, h)


@given(w=st.integers(1, 2**16 - 1), h=st.integers(1, 2**16 - 1))
def test_gif_roundtrip(w, h):
    assert _parse_image_header(_gif_bytes(w, h)) == ("gif", w, h)


@given(w=st.integers(1, 2**31 - 1), h=st.integers(-(2**31) + 1, 2**31 - 1))
def test_bmp_roundtrip_including_topdown(w, h):
    blob = _bmp_bytes(w, h)
    if h == 0:
        _parse_image_header(blob)  # degenerate but must not crash
    else:
        assert _parse_image_header(blob) == ("bmp", w, abs(h))


@given(
    w=st.integers(1, 2**16 - 1),
    h=st.integers(1, 2**16 - 1),
    segments=st.lists(
        st.tuples(
            st.sampled_from([0xE0, 0xE1, 0xED, 0xFE]),  # APPn/COM
            st.binary(min_size=0, max_size=64),
        ),
        max_size=6,
    ),
    fill=st.integers(0, 3),
)
def test_jpeg_sof_found_past_arbitrary_segments(w, h, segments, fill):
    """The segment walker must reach SOF0 across any run of APPn/COM
    segments (arbitrary payloads, including 0xFF bytes inside payloads,
    which the length field — not resync — must skip) and optional fill
    bytes before markers."""
    out = b"\xff\xd8"
    for marker, payload in segments:
        out += b"\xff" * fill
        out += bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload
    out += b"\xff" * fill
    out += b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    out += b"\xff\xd9"
    assert _parse_image_header(out) == ("jpeg", w, h)


@given(blob=st.binary(max_size=256))
@settings(max_examples=300)
def test_total_function_contract_random_bytes(blob):
    """Any input parses or raises ValueError — no struct.error /
    IndexError escapes to miscategorize a corrupt shard."""
    try:
        fmt, w, h = _parse_image_header(blob)
        assert fmt in ("png", "jpeg", "gif", "bmp")
        assert isinstance(w, int) and isinstance(h, int)
    except ValueError:
        pass


@given(
    w=st.integers(1, 2**16 - 1),
    h=st.integers(1, 2**16 - 1),
    cut=st.integers(0, 40),
)
def test_truncations_parse_or_valueerror(w, h, cut):
    """Every prefix of a valid file is either still parseable (cut past
    the header) or a clean ValueError."""
    for blob in (png_bytes(w, h), _gif_bytes(w, h)):
        t = blob[: max(0, len(blob) - cut)]
        try:
            got = _parse_image_header(t)
            assert got[1:] == (w, h)
        except ValueError:
            pass
