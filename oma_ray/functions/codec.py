"""Binary codec for the OMA container format (reader side).

Implements the exact wire encodings of the reference's stream classes so the
engine can decode ``oma.jar`` output for differential testing:

- big-endian signed ints/longs/shorts (Java DataOutputStream)
- ``smallInt`` varint: 1 byte if <255, else 0xff + 2 bytes if <65535, else
  0xff 0xff 0xff + 4 bytes (OmaOutputStream.java:55-70,
  OmaInputStream.java:53-60)
- length-prefixed UTF-8 strings (OmaInputStream.java:61-68)
- delta-coded coords: per-stream running (lastx, lasty); 2-byte delta when it
  fits, escape -32768 + 4-byte absolute otherwise; reset per slice
  (OmaInputStream.java:69-91, TypeAnalysis.java:657)
"""

from __future__ import annotations

import struct
import zlib


class OmaReader:
    """Sequential reader over a bytes buffer with the OMA primitives."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos
        self.lastx = 0
        self.lasty = 0

    def read_byte(self) -> int:
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def read_bytes(self, n: int) -> bytes:
        v = self.buf[self.pos : self.pos + n]
        if len(v) != n:
            raise EOFError
        self.pos += n
        return v

    def read_short(self) -> int:
        return struct.unpack_from(">h", self.buf, self._adv(2))[0]

    def read_ushort(self) -> int:
        return struct.unpack_from(">H", self.buf, self._adv(2))[0]

    def read_int(self) -> int:
        return struct.unpack_from(">i", self.buf, self._adv(4))[0]

    def read_long(self) -> int:
        return struct.unpack_from(">q", self.buf, self._adv(8))[0]

    def _adv(self, n: int) -> int:
        p = self.pos
        self.pos += n
        return p

    def read_small_int(self) -> int:
        v = self.read_byte()
        if v < 255:
            return v
        v = self.read_ushort()
        if v < 65535:
            return v
        return self.read_int()

    def read_string(self) -> str:
        n = self.read_small_int()
        return self.read_bytes(n).decode("utf-8")

    def reset_delta(self) -> None:
        self.lastx = self.lasty = 0

    def _delta(self, last: int) -> int:
        d = self.read_short()
        if d == -32768:
            return self.read_int()
        return last + d

    def read_delta_x(self) -> int:
        self.lastx = self._delta(self.lastx)
        return self.lastx

    def read_delta_y(self) -> int:
        self.lasty = self._delta(self.lasty)
        return self.lasty


def inflate(data: bytes) -> bytes:
    """Raw DEFLATE stream as produced by java.util.zip.DeflaterOutputStream
    (zlib-wrapped)."""
    return zlib.decompress(data)
