"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride the pipeline as ``binary`` columns with a metadata
struct, processed by actor-pool ``map_batches`` stages (per the 100 TB
design: decode libraries load once per actor, batches stay small because
payloads are wide).  The image/audio codec libraries are NOT available in
this container, so the decode kernels are deterministic STUBS behind a
clearly marked seam (``_decode_image_real`` raises NotImplementedError);
the Ray-side plumbing — schemas, batch sizing, actor signature, output
layout — is real and tested.

Payload stub format ("OMI" fake image): 12-byte header
``b"OMI" + width:uint16 + height:uint16 + channels:uint8 + pad`` followed by
deterministic bytes.  ``synth_image_batch`` produces it; a real deployment
swaps the decode kernel and nothing else.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

IMAGE_META = pa.struct(
    [("width", pa.int32()), ("height", pa.int32()), ("channels", pa.int32())]
)


def synth_image_payload(seed: int, width: int, height: int, channels: int = 3) -> bytes:
    header = b"OMI" + struct.pack(">HHB", width, height, channels) + b"\0\0\0\0"
    n = min(width * height * channels, 256)
    body = bytes(((seed * 31 + i * 7) % 256) for i in range(n))
    return header + body


def synth_image_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Attach a deterministic fake image per row (bench/test input prep)."""
    ids = batch.column(id_col).to_numpy()
    payloads = [
        synth_image_payload(int(i), 64 + int(i) % 192, 64 + int(i * 7) % 192)
        for i in ids
    ]
    return batch.append_column("image", pa.array(payloads, type=pa.binary()))


def _decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """Parse the OMI stub header → (width, height, channels)."""
    if payload[:3] != b"OMI":
        raise ValueError("not an OMI payload")
    w, h, c = struct.unpack(">HHB", payload[3:8])
    return w, h, c


def _decode_image_real(payload: bytes):  # pragma: no cover - deliberate stub
    """Swap-in point for a real codec (PIL / libvips / ffmpeg)."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "replace ImageDecode._decode to use a real library"
    )


class ImageDecode:
    """Actor-pool stage: decode header metadata + extract a deterministic
    feature vector per image.  Use with
    ``map_batches(ImageDecode, concurrency=(1, N), batch_size=小)`` — small
    batches because payloads are wide (memory-aware batch sizing)."""

    def __init__(self, feature_dim: int = 16, image_col: str = "image"):
        self.feature_dim = feature_dim
        self.image_col = image_col
        self._decode = _decode_image_stub  # real codec slots in here

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = []
        feats = np.zeros((len(batch), self.feature_dim), dtype=np.float32)
        for i, payload in enumerate(batch.column(self.image_col).to_pylist()):
            w, h, c = self._decode(payload)
            metas.append({"width": w, "height": h, "channels": c})
            body = np.frombuffer(payload[12:], dtype=np.uint8).astype(np.float32)
            if len(body):
                k = len(body) // self.feature_dim or 1
                feats[i, : min(self.feature_dim, len(body))] = [
                    body[j * k : (j + 1) * k].mean() if len(body[j * k : (j + 1) * k]) else 0.0
                    for j in range(min(self.feature_dim, len(body)))
                ]
        batch = batch.append_column("image_meta", pa.array(metas, type=IMAGE_META))
        return batch.append_column(
            "image_features",
            pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32())),
        )


class ImageResizePlan:
    """Stateless stage computing resize plans (target dims preserving aspect
    ratio) from the metadata only — the real resample happens in the decode
    actor when a codec is present."""

    def __init__(self, max_side: int = 224):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        meta = batch.column("image_meta")
        w = np.array([m["width"] for m in meta.to_pylist()], dtype=np.float64)
        h = np.array([m["height"] for m in meta.to_pylist()], dtype=np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        return batch.append_column(
            "resize_to",
            pa.array(
                [
                    {"width": int(ww * s), "height": int(hh * s)}
                    for ww, hh, s in zip(w, h, scale)
                ],
                type=pa.struct([("width", pa.int32()), ("height", pa.int32())]),
            ),
        )
