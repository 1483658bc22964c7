"""Charset kernels (stages/charset.py) vs Python's own codecs."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from oma_ray.stages.charset import (
    detect_and_decode,
    latin1_to_utf8,
    utf8_valid_mask,
)

SAMPLES = [
    b"plain ascii",
    "caf\xe9 r\xe9sum\xe9".encode("utf-8"),
    "caf\xe9 r\xe9sum\xe9".encode("latin-1"),
    b"",
    b"\xff\xfe broken",
    "日本語テキスト".encode("utf-8"),
    b"truncated \xc3",
    b"orphan \x80 cont",
    b"a\xf0\x9f\x98\x80b",  # 4-byte sequence
    b"\xe2\x82",            # truncated 3-byte lead
    b"\xc3\xa9\xc3",        # valid pair then truncated lead
]


def _pyvalid(s: bytes) -> bool:
    try:
        s.decode("utf-8")
        return True
    except UnicodeDecodeError:
        return False


def test_utf8_valid_mask_matches_python():
    col = pa.array(SAMPLES, type=pa.binary())
    assert utf8_valid_mask(col).tolist() == [_pyvalid(s) for s in SAMPLES]


def test_detect_and_decode_whatwg_fallback():
    col = pa.array(SAMPLES, type=pa.binary())
    valid, text = detect_and_decode(col)
    want = [s.decode("utf-8") if _pyvalid(s) else s.decode("latin-1")
            for s in SAMPLES]
    assert text.to_pylist() == want


def test_latin1_transcode_full_byte_range():
    col = pa.array([bytes(range(256)), b"", b"\x80\xff"], type=pa.binary())
    got = latin1_to_utf8(col).to_pylist()
    assert got == [bytes(range(256)).decode("latin-1"), "",
                   b"\x80\xff".decode("latin-1")]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.binary(max_size=40), min_size=1, max_size=12))
def test_utf8_valid_mask_property(rows):
    col = pa.array(rows, type=pa.binary())
    assert utf8_valid_mask(col).tolist() == [_pyvalid(s) for s in rows]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.binary(max_size=40), min_size=1, max_size=8))
def test_decode_property(rows):
    col = pa.array(rows, type=pa.binary())
    _, text = detect_and_decode(col)
    want = [s.decode("utf-8") if _pyvalid(s) else s.decode("latin-1")
            for s in rows]
    assert text.to_pylist() == want
