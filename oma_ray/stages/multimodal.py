"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride the pipeline as ``binary`` columns with a metadata
struct, processed by actor-pool ``map_batches`` stages (per the 100 TB
design: decode libraries load once per actor, batches stay small because
payloads are wide).

Codec status, dispatched on magic bytes per payload:

- **PPM (P6) — REAL**: pure-numpy decode, nearest-neighbour resize and
  feature extraction (channel means + grayscale histogram); needs no
  external libraries, so the full decode→resize→feature path actually
  executes end-to-end in this container.
- **BMP (24-bit uncompressed) — REAL**: pure-numpy encode/decode with
  the format's 4-byte row padding, BGR order and bottom-up (or
  negative-height top-down) row layout.
- **"OMI" fake image** — deterministic stub payload for plumbing tests.
- **JPEG / PNG / anything else** — honest NotImplementedError seam
  (``_decode_image_real``): those codecs need PIL/libvips, absent here;
  a real deployment swaps the kernel and nothing else changes.
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
        "JPEG/PNG codecs are not available in this environment; "
        "replace ImageDecode._decode to use a real library"
    )


# --- PPM (P6): a real, dependency-free image codec --------------------------

def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary P6 PPM."""
    h, w, c = pixels.shape
    assert c == 3
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def encode_pgm(pixels: np.ndarray) -> bytes:
    """(h, w) uint8 grayscale → binary P5 PGM."""
    h, w = pixels.shape
    return b"P5\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def decode_pgm(payload: bytes) -> np.ndarray:
    """Binary P5 PGM → (h, w) uint8 (same header grammar as P6)."""
    if payload[:2] != b"P5":
        raise ValueError("not a P5 PGM payload")
    w, h, pos = _pnm_header(payload)
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=pos)
    return data.reshape(h, w)


def _pnm_header(payload: bytes) -> tuple[int, int, int]:
    """Parse the PNM header after the magic → (w, h, pixel offset);
    supports comments + any whitespace."""
    pos = 2
    vals = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos: pos + 1].isspace():
            pos += 1
        if payload[pos: pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos: pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported PNM maxval {maxval}")
    return w, h, pos


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM → (h, w, 3) uint8 (shared PNM header grammar)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    w, h, pos = _pnm_header(payload)
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3)


# --- BMP (24-bit, BITMAPINFOHEADER): a real, dependency-free codec ----------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP (BGR, bottom-up rows,
    4-byte row padding — the format's required on-disk layout)."""
    h, w, c = pixels.shape
    assert c == 3
    row = w * 3
    pad = (-row) % 4
    bgr = pixels[::-1, :, ::-1].astype(np.uint8).reshape(h, row)
    if pad:
        bgr = np.concatenate(
            [bgr, np.zeros((h, pad), dtype=np.uint8)], axis=1)
    body = bgr.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    return header + info + body


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB.  Handles both
    bottom-up (positive height) and top-down (negative height) layouts
    and any pixel-data offset the header declares."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    ah = abs(h)
    row = w * 3
    stride = (row + 3) // 4 * 4
    data = np.frombuffer(payload, dtype=np.uint8, count=stride * ah,
                         offset=off)
    img = data.reshape(ah, stride)[:, :row].reshape(ah, w, 3)[:, :, ::-1]
    if h > 0:
        img = img[::-1]
    return np.ascontiguousarray(img)


def encode_tga(img: np.ndarray, top_down: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit true-color TGA (image
    type 2, BGR pixel order; bottom-up unless ``top_down`` sets
    descriptor bit 5 — both layouts round-trip)."""
    h, w, _ = img.shape
    desc = 0x20 if top_down else 0x00
    header = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0,
                         w, h, 24, desc)
    body = img[:, :, ::-1] if top_down else img[::-1, :, ::-1]
    return header + np.ascontiguousarray(body).tobytes()


def decode_tga(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit true-color TGA → (h, w, 3) uint8 RGB (both
    bottom-up and top-down descriptor layouts, id-field skipped)."""
    idlen, cmap, imgtype = payload[0], payload[1], payload[2]
    if imgtype != 2 or cmap != 0:
        raise ValueError(f"unsupported TGA (type={imgtype}, cmap={cmap})")
    w, h = struct.unpack_from("<HH", payload, 12)
    bpp, desc = payload[16], payload[17]
    if bpp != 24:
        raise ValueError(f"unsupported TGA bpp={bpp}")
    off = 18 + idlen
    data = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3,
                         offset=off)
    img = data.reshape(h, w, 3)[:, :, ::-1]
    if not (desc & 0x20):  # bottom-up origin
        img = img[::-1]
    return np.ascontiguousarray(img)


def _is_tga(payload: bytes) -> bool:
    """Type-2 uncompressed true-color TGA heuristic (TGA has no leading
    magic; colormap=0 + imagetype=2 + bpp 24 at the fixed offsets)."""
    return (len(payload) >= 18 and payload[1] == 0 and payload[2] == 2
            and payload[16] == 24)


def synth_bmp_batch(batch: pa.Table, id_col: str = "doc_id",
                    col: str = "image") -> pa.Table:
    """Attach a real (deterministic gradient) 24-bit BMP per row; widths
    deliberately hit every padding residue (w % 4 ∈ {0,1,2,3}).  The full
    64-bit id is stamped into the first 8 pixels' blue channel so content
    is UNIQUE corpus-wide (the gradient alone repeats with period
    lcm(64,48,256)=768 in the id, which would plant unintended exact
    duplicates at corpora larger than 768 docs — ADVICE r4)."""
    ids = batch.column(id_col).to_numpy()
    payloads = []
    for i in ids:
        w = 31 + int(i) % 64
        h = 17 + int(i * 5) % 48
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.stack(
            [
                (yy * 255 // max(1, h - 1)),
                ((xx * yy + int(i)) % 256),
                (xx * 255 // max(1, w - 1)),
            ],
            axis=-1,
        ).astype(np.uint8)
        px[0, :8, 0] = np.frombuffer(
            np.uint64(i).tobytes(), dtype=np.uint8)
        payloads.append(encode_bmp(px))
    return batch.append_column(col, pa.array(payloads, type=pa.binary()))


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resample via numpy index gather (no Python loop)."""
    h, w = img.shape[:2]
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return img[rows[:, None], cols[None, :]]


def ppm_features(img: np.ndarray, dim: int = 16) -> np.ndarray:
    """Deterministic feature vector: 3 channel means + contrast (std) +
    (dim-4)-bin grayscale histogram (density)."""
    f = np.zeros(dim, dtype=np.float32)
    fl = img.reshape(-1, 3).astype(np.float32)
    f[:3] = fl.mean(axis=0)
    f[3] = fl.std()
    gray = fl.mean(axis=1)
    hist, _ = np.histogram(gray, bins=dim - 4, range=(0.0, 255.0))
    f[4:] = hist / max(1, gray.size)
    return f


def synth_ppm_batch(batch: pa.Table, id_col: str = "doc_id",
                    col: str = "image") -> pa.Table:
    """Attach a real (deterministic gradient) P6 image per row."""
    ids = batch.column(id_col).to_numpy()
    payloads = []
    for i in ids:
        w = 32 + int(i) % 64
        h = 24 + int(i * 3) % 64
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.stack(
            [
                (xx * 255 // max(1, w - 1)),
                (yy * 255 // max(1, h - 1)),
                ((xx + yy + int(i)) % 256),
            ],
            axis=-1,
        ).astype(np.uint8)
        payloads.append(encode_ppm(px))
    return batch.append_column(col, pa.array(payloads, type=pa.binary()))


class ImageDecode:
    """Actor-pool stage: decode metadata + a deterministic feature vector
    per image, dispatching per payload magic (P6 real / OMI stub / rest →
    NotImplementedError seam).  Use with
    ``map_batches(ImageDecode, concurrency=(1, N), batch_size=small)`` —
    small batches because payloads are wide (memory-aware batch sizing)."""

    def __init__(self, feature_dim: int = 16, image_col: str = "image"):
        self.feature_dim = feature_dim
        self.image_col = image_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = []
        feats = np.zeros((len(batch), self.feature_dim), dtype=np.float32)
        for i, payload in enumerate(batch.column(self.image_col).to_pylist()):
            if payload[:2] == b"P6":
                img = decode_ppm(payload)
                h, w, c = img.shape
                feats[i] = ppm_features(img, self.feature_dim)
            elif payload[:2] == b"BM":
                img = decode_bmp(payload)
                h, w, c = img.shape
                feats[i] = ppm_features(img, self.feature_dim)
            elif payload[:2] == b"P5":
                gray = decode_pgm(payload)
                h, w = gray.shape
                c = 1
                img = np.repeat(gray[:, :, None], 3, axis=2)
                feats[i] = ppm_features(img, self.feature_dim)
            elif _is_tga(payload):
                img = decode_tga(payload)
                h, w, c = img.shape
                feats[i] = ppm_features(img, self.feature_dim)
            elif payload[:3] == b"OMI":
                w, h, c = _decode_image_stub(payload)
                body = np.frombuffer(payload[12:], dtype=np.uint8).astype(np.float32)
                if len(body):
                    k = len(body) // self.feature_dim or 1
                    feats[i, : min(self.feature_dim, len(body))] = [
                        body[j * k : (j + 1) * k].mean()
                        if len(body[j * k : (j + 1) * k]) else 0.0
                        for j in range(min(self.feature_dim, len(body)))
                    ]
            else:
                _decode_image_real(payload)
            metas.append({"width": w, "height": h, "channels": c})
        batch = batch.append_column("image_meta", pa.array(metas, type=IMAGE_META))
        return batch.append_column(
            "image_features",
            pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32())),
        )


# --- WAV (RIFF/PCM16): a real, dependency-free audio codec ------------------

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) int16 mono PCM → RIFF WAVE bytes."""
    data = samples.astype("<i2").tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF WAVE → ((n,) int16 mono samples, sample_rate).  PCM16 only;
    walks the chunk list so extra chunks (LIST, fact) are tolerated."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF WAVE payload")
    pos = 12
    rate = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body)
            if fmt != 1 or bits != 16 or channels != 1:
                raise ValueError(
                    f"unsupported WAV format (fmt={fmt}, bits={bits}, "
                    f"channels={channels}): PCM16 mono only"
                )
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    return data, rate


def wav_features(samples: np.ndarray, rate: int, dim: int = 16) -> np.ndarray:
    """Deterministic audio features: RMS, zero-crossing rate, then
    (dim-2) log-spectral-band energies from one rFFT."""
    f = np.zeros(dim, dtype=np.float32)
    if not len(samples):
        return f
    x = samples.astype(np.float64) / 32768.0
    f[0] = np.sqrt((x * x).mean())
    f[1] = float((np.diff(np.signbit(x)) != 0).mean()) if len(x) > 1 else 0.0
    spec = np.abs(np.fft.rfft(x))
    bands = np.array_split(spec, dim - 2)
    f[2:] = [np.log1p(b.sum()) for b in bands]
    return f


def frame_sample(samples: np.ndarray, n_frames: int, frame_len: int) -> np.ndarray:
    """Evenly-spaced fixed-length frames, (n_frames, frame_len) — the audio
    analogue of video frame sampling (gather, no Python loop over samples)."""
    n = len(samples)
    if n == 0:
        return np.zeros((n_frames, frame_len), dtype=samples.dtype)
    starts = (np.arange(n_frames) * max(1, n - frame_len) // max(1, n_frames - 1)
              if n_frames > 1 else np.array([0]))
    idx = starts[:, None] + np.arange(frame_len)[None, :]
    return samples[np.clip(idx, 0, n - 1)]


def synth_wav_batch(batch: pa.Table, id_col: str = "doc_id",
                    col: str = "audio", rate: int = 8000) -> pa.Table:
    """Attach a real (deterministic two-tone) PCM16 WAV per row."""
    ids = batch.column(id_col).to_numpy()
    payloads = []
    for i in ids:
        n = rate // 2 + int(i) % rate  # 0.5-1.5 s
        t = np.arange(n) / rate
        f1, f2 = 200 + int(i) % 600, 1000 + int(i * 7) % 2000
        x = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
        payloads.append(encode_wav((x * 20000).astype(np.int16), rate))
    return batch.append_column(col, pa.array(payloads, type=pa.binary()))


class AudioDecode:
    """Actor-pool stage: WAV (real) → duration/rate metadata + spectral
    feature vector + evenly-sampled frames; non-RIFF payloads hit the
    honest codec seam like images."""

    def __init__(self, feature_dim: int = 16, n_frames: int = 4,
                 frame_len: int = 256, audio_col: str = "audio"):
        self.feature_dim = feature_dim
        self.n_frames = n_frames
        self.frame_len = frame_len
        self.audio_col = audio_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas, feats, frames = [], [], []
        for payload in batch.column(self.audio_col).to_pylist():
            if payload[:4] != b"RIFF":
                raise NotImplementedError(
                    "only RIFF/PCM16 WAV decodes natively; other audio "
                    "codecs need ffmpeg/soundfile, absent here"
                )
            samples, rate = decode_wav(payload)
            metas.append({"n_samples": len(samples), "rate": rate})
            feats.append(wav_features(samples, rate, self.feature_dim).tolist())
            frames.append(
                frame_sample(samples, self.n_frames, self.frame_len)
                .astype(np.int16).reshape(-1).tolist()
            )
        batch = batch.append_column(
            "audio_meta",
            pa.array(metas, type=pa.struct(
                [("n_samples", pa.int64()), ("rate", pa.int32())]
            )),
        )
        batch = batch.append_column(
            "audio_features", pa.array(feats, type=pa.list_(pa.float32()))
        )
        return batch.append_column(
            "audio_frames", pa.array(frames, type=pa.list_(pa.int16()))
        )


class ImageResize:
    """Actor-pool stage: REAL resample for P6 payloads (decode →
    nearest-neighbour resize preserving aspect ratio → re-encode),
    replacing the payload column; non-P6 payloads pass through untouched
    (their resize stays a plan until a codec is present)."""

    def __init__(self, max_side: int = 224, image_col: str = "image"):
        self.max_side = max_side
        self.image_col = image_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch.column(self.image_col).to_pylist():
            if payload[:2] == b"P6":
                img = decode_ppm(payload)
                h, w = img.shape[:2]
                s = min(1.0, self.max_side / max(w, h))
                if s < 1.0:
                    img = resize_nearest(img, max(1, int(w * s)), max(1, int(h * s)))
                    payload = encode_ppm(img)
            out.append(payload)
        idx = batch.column_names.index(self.image_col)
        return batch.set_column(idx, self.image_col,
                                pa.array(out, type=pa.binary()))


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


# --- RAWV: a real, dependency-free video container ---------------------------
#
# Frames are raw RGB24 planes behind a fixed header — the honest analogue of
# PPM/WAV above: the container logic (header parse, frame gather, keyframe
# sampling, per-frame features, memory-aware batch sizing) is REAL and runs
# end-to-end here; MP4/H.264/WebM decoding needs ffmpeg/PyAV (absent in this
# environment) and enters through the `_decode_video_real` seam.

VIDEO_META = pa.struct(
    [
        ("width", pa.int32()), ("height", pa.int32()),
        ("n_frames", pa.int32()), ("n_sampled", pa.int32()),
    ]
)


def encode_rawv(frames: np.ndarray) -> bytes:
    """(n_frames, h, w, 3) uint8 → RAWV payload."""
    n, h, w, c = frames.shape
    assert c == 3
    return b"RAWV" + struct.pack(">HHH", w, h, n) + frames.astype(np.uint8).tobytes()


def decode_rawv(payload: bytes) -> np.ndarray:
    """RAWV payload → (n_frames, h, w, 3) uint8 (zero-copy frombuffer)."""
    if payload[:4] != b"RAWV":
        raise ValueError("not a RAWV payload")
    w, h, n = struct.unpack(">HHH", payload[4:10])
    data = np.frombuffer(payload, dtype=np.uint8, count=n * h * w * 3, offset=10)
    return data.reshape(n, h, w, 3)


def _decode_video_real(payload: bytes):  # pragma: no cover - deliberate stub
    """Swap-in point for a real video decoder (ffmpeg / PyAV)."""
    raise NotImplementedError(
        "MP4/H.264/WebM codecs are not available in this environment; "
        "replace VideoFrameSample._decode to use a real library"
    )


def keyframe_indices(n_frames: int, k: int) -> np.ndarray:
    """Evenly-spaced frame indices (≤ k of them, always includes frame 0;
    includes the last frame when k > 1)."""
    k = min(k, n_frames)
    if k <= 1:
        return np.zeros(max(k, 0), dtype=np.int64)
    return np.arange(k) * (n_frames - 1) // (k - 1)


def synth_rawv_batch(batch: pa.Table, id_col: str = "doc_id",
                     col: str = "video") -> pa.Table:
    """Attach a real deterministic RAWV clip per row (moving gradient with
    per-frame phase, variable geometry and length)."""
    ids = batch.column(id_col).to_numpy()
    payloads = []
    for i in ids:
        w = 16 + int(i) % 32
        h = 12 + int(i * 3) % 24
        n = 6 + int(i * 7) % 15
        t = np.arange(n)[:, None, None]
        yy, xx = np.mgrid[0:h, 0:w]
        frames = np.stack(
            [
                (xx[None] * 255 // max(1, w - 1) + t * 11) % 256,
                (yy[None] * 255 // max(1, h - 1) + t * 5) % 256,
                (xx[None] + yy[None] + t * 17 + int(i)) % 256,
            ],
            axis=-1,
        ).astype(np.uint8)
        payloads.append(encode_rawv(frames))
    return batch.append_column(col, pa.array(payloads, type=pa.binary()))


class VideoFrameSample:
    """Actor-pool stage: decode each clip, sample ≤ ``n_keyframes`` evenly
    spaced frames, and emit per-clip metadata, the sampled indices and a
    mean-pooled per-frame feature vector.  Use with small ``batch_size`` —
    clips are the widest payloads in the pipeline (memory-aware sizing:
    batch_bytes ≈ batch_size × frames × h × w × 3)."""

    def __init__(self, n_keyframes: int = 4, feature_dim: int = 16,
                 video_col: str = "video"):
        self.n_keyframes = n_keyframes
        self.feature_dim = feature_dim
        self.video_col = video_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas, feats, kidx = [], [], []
        for payload in batch.column(self.video_col).to_pylist():
            if payload[:4] == b"RAWV":
                frames = decode_rawv(payload)
            else:
                frames = _decode_video_real(payload)
            n, h, w, _ = frames.shape
            idx = keyframe_indices(n, self.n_keyframes)
            if len(idx):
                per_frame = np.stack(
                    [ppm_features(frames[j], self.feature_dim) for j in idx]
                )
            else:  # zero-frame clip: valid container, nothing to sample
                per_frame = np.zeros((1, self.feature_dim), dtype=np.float32)
            metas.append(
                {"width": w, "height": h, "n_frames": n, "n_sampled": len(idx)}
            )
            feats.append(per_frame.mean(axis=0).tolist())
            kidx.append(idx.astype(np.int32).tolist())
        batch = batch.append_column("video_meta", pa.array(metas, type=VIDEO_META))
        batch = batch.append_column(
            "keyframe_idx", pa.array(kidx, type=pa.list_(pa.int32()))
        )
        return batch.append_column(
            "video_features",
            pa.array(feats, type=pa.list_(pa.float32())),
        )
