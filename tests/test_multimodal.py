"""Multimodal plumbing: binary payload schema, actor-pool decode, resize."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_decode_pipeline_end_to_end():
    import ray.data as rd

    from oma_ray.sources.parquet import read_parquet_clean
    from oma_ray.stages.multimodal import ImageDecode, ImageResizePlan, synth_image_batch

    ds = read_parquet_clean(f"{SF}/documents.parquet", columns=["doc_id"])
    ds = ds.map_batches(synth_image_batch, batch_format="pyarrow")
    ds = ds.map_batches(
        ImageDecode, batch_format="pyarrow", batch_size=64, concurrency=(1, 2)
    )
    ds = ds.map_batches(ImageResizePlan(), batch_format="pyarrow")
    rows = ds.take(10)
    for r in rows:
        assert r["image_meta"]["width"] >= 64
        assert len(r["image_features"]) == 16
        rt = r["resize_to"]
        assert max(rt["width"], rt["height"]) <= 224
    # determinism
    again = (
        read_parquet_clean(f"{SF}/documents.parquet", columns=["doc_id"])
        .map_batches(synth_image_batch, batch_format="pyarrow")
        .map_batches(ImageDecode, batch_format="pyarrow", batch_size=64,
                     concurrency=(1, 2))
        .take(10)
    )
    for a, b in zip(rows, again):
        assert a["image_features"] == b["image_features"]


def test_real_codec_seam_is_marked():
    from oma_ray.stages.multimodal import _decode_image_real

    with pytest.raises(NotImplementedError):
        _decode_image_real(b"\x89PNG")


def test_ppm_codec_roundtrip():
    import numpy as np

    from oma_ray.stages.multimodal import decode_ppm, encode_ppm, resize_nearest

    img = (np.arange(24 * 32 * 3) % 256).astype("uint8").reshape(24, 32, 3)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    # comment + whitespace variants parse too
    hdr = b"P6\n# a comment\n32   24\n255\n"
    assert (decode_ppm(hdr + img.tobytes()) == img).all()
    small = resize_nearest(img, 16, 12)
    assert small.shape == (12, 16, 3)
    assert (small == img[::2, ::2]).all()


def test_ppm_real_decode_pipeline(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from oma_ray.stages.multimodal import (
        ImageDecode, ImageResize, decode_ppm, synth_ppm_batch,
    )

    base = rd.range(40).map_batches(
        lambda b: pa.table({"doc_id": pa.array(b["id"], type=pa.int64())}),
        batch_format="default",
    )
    ds = base.map_batches(synth_ppm_batch, batch_format="pyarrow")
    ds = ds.map_batches(ImageResize, fn_constructor_args=(48,),
                        batch_format="pyarrow", concurrency=(1, 2), batch_size=16)
    ds = ds.map_batches(ImageDecode, fn_constructor_args=(),
                        batch_format="pyarrow", concurrency=(1, 2), batch_size=16)
    df = ds.to_pandas()
    assert len(df) == 40
    # resize bound holds on the REAL pixels
    for p in df["image"]:
        img = decode_ppm(p)
        assert max(img.shape[:2]) <= 48
    # metadata matches the resized payloads and features are real pixels
    for _, row in df.iterrows():
        img = decode_ppm(row["image"])
        assert row["image_meta"]["height"] == img.shape[0]
        assert row["image_meta"]["width"] == img.shape[1]
        f = np.asarray(row["image_features"])
        assert abs(f[:3].mean() - img.reshape(-1, 3).mean()) < 1.0
        assert abs(f[4:].sum() - 1.0) < 1e-5  # histogram is a density


def test_pgm_codec_roundtrip():
    import numpy as np
    import pyarrow as pa

    from oma_ray.stages.multimodal import (
        ImageDecode, decode_pgm, encode_pgm,
    )

    img = (np.arange(13 * 21) % 256).astype("uint8").reshape(13, 21)
    assert (decode_pgm(encode_pgm(img)) == img).all()
    hdr = b"P5\n# comment\n21  13\n255\n"
    assert (decode_pgm(hdr + img.tobytes()) == img).all()
    batch = pa.table({"image": pa.array([encode_pgm(img)],
                                        type=pa.binary())})
    out = ImageDecode()(batch)
    meta = out.column("image_meta")[0].as_py()
    assert (meta["width"], meta["height"], meta["channels"]) == (21, 13, 1)
    f = np.asarray(out.column("image_features")[0].as_py())
    assert abs(f[:3].mean() - img.astype(np.float64).mean()) < 1.0


def test_bmp_codec_roundtrip_property():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from oma_ray.stages.multimodal import decode_bmp, encode_bmp

    @settings(max_examples=40, deadline=None)
    @given(st.integers(min_value=1, max_value=37),
           st.integers(min_value=1, max_value=23),
           st.integers(min_value=0, max_value=2**31 - 1))
    def roundtrip(w, h, seed):
        img = ((np.arange(h * w * 3, dtype=np.int64) * 2654435761 + seed)
               % 256).astype("uint8").reshape(h, w, 3)
        assert (decode_bmp(encode_bmp(img)) == img).all()

    roundtrip()


def test_bmp_codec_roundtrip():
    import numpy as np
    import struct

    from oma_ray.stages.multimodal import decode_bmp, encode_bmp

    # every 4-byte padding residue (w*3 % 4 ∈ {0,1,2,3} over w 8..11)
    for w in (8, 9, 10, 11):
        img = ((np.arange(7 * w * 3) * 13) % 256).astype(
            "uint8").reshape(7, w, 3)
        assert (decode_bmp(encode_bmp(img)) == img).all()
    # top-down (negative height) decode
    img = (np.arange(5 * 8 * 3) % 256).astype("uint8").reshape(5, 8, 3)
    payload = bytearray(encode_bmp(img))
    struct.pack_into("<i", payload, 22, -5)
    # flip the stored rows back to top-down order to keep the same image
    off = 54
    rows = [bytes(payload[off + i * 24: off + (i + 1) * 24])
            for i in range(5)]
    payload[off:] = b"".join(reversed(rows))
    assert (decode_bmp(bytes(payload)) == img).all()


def test_bmp_real_decode_pipeline(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from oma_ray.stages.multimodal import (
        ImageDecode, decode_bmp, synth_bmp_batch,
    )

    base = rd.range(24).map_batches(
        lambda b: pa.table({"doc_id": pa.array(b["id"], type=pa.int64())}),
        batch_format="default",
    )
    ds = base.map_batches(synth_bmp_batch, batch_format="pyarrow")
    ds = ds.map_batches(ImageDecode, fn_constructor_args=(),
                        batch_format="pyarrow", concurrency=(1, 2),
                        batch_size=8)
    df = ds.to_pandas()
    assert len(df) == 24
    for _, row in df.iterrows():
        img = decode_bmp(row["image"])
        assert row["image_meta"]["height"] == img.shape[0]
        assert row["image_meta"]["width"] == img.shape[1]
        f = np.asarray(row["image_features"])
        assert abs(f[:3].mean() - img.reshape(-1, 3).mean()) < 1.0


def test_unknown_codec_raises():
    import pyarrow as pa
    import pytest as _pytest

    from oma_ray.stages.multimodal import ImageDecode

    batch = pa.table({"image": pa.array([b"\x89PNG\r\n\x1a\n garbage"],
                                        type=pa.binary())})
    with _pytest.raises(NotImplementedError):
        ImageDecode()(batch)


def test_wav_codec_roundtrip():
    import numpy as np

    from oma_ray.stages.multimodal import decode_wav, encode_wav, frame_sample

    x = (np.sin(np.arange(4000) / 10.0) * 10000).astype(np.int16)
    back, rate = decode_wav(encode_wav(x, 8000))
    assert rate == 8000 and (back == x).all()
    fr = frame_sample(x, 4, 256)
    assert fr.shape == (4, 256)
    assert (fr[0] == x[:256]).all()
    assert (fr[-1] == x[-256:]).all()


def test_wav_real_decode_pipeline(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from oma_ray.stages.multimodal import AudioDecode, decode_wav, synth_wav_batch

    base = rd.range(20).map_batches(
        lambda b: pa.table({"doc_id": pa.array(b["id"], type=pa.int64())}),
        batch_format="default",
    )
    ds = base.map_batches(synth_wav_batch, batch_format="pyarrow")
    ds = ds.map_batches(AudioDecode, batch_format="pyarrow",
                        concurrency=(1, 2), batch_size=8)
    df = ds.to_pandas()
    assert len(df) == 20
    for _, row in df.iterrows():
        samples, rate = decode_wav(row["audio"])
        assert row["audio_meta"]["n_samples"] == len(samples)
        assert row["audio_meta"]["rate"] == rate == 8000
        f = np.asarray(row["audio_features"])
        assert 0.0 < f[0] < 1.0  # RMS of a two-tone signal
        assert len(row["audio_frames"]) == 4 * 256


def test_wav_unsupported_format():
    import pytest as _pytest

    from oma_ray.stages.multimodal import decode_wav, encode_wav
    import numpy as np
    import struct

    # stereo header rejected with a named error
    payload = bytearray(encode_wav(np.zeros(10, dtype=np.int16)))
    struct.pack_into("<H", payload, 22, 2)  # channels = 2
    with _pytest.raises(ValueError, match="PCM16 mono"):
        decode_wav(bytes(payload))


def test_rawv_round_trip_and_keyframes():
    from oma_ray.stages.multimodal import (
        decode_rawv, encode_rawv, keyframe_indices,
    )

    frames = (np.arange(5 * 8 * 6 * 3) % 256).astype(np.uint8).reshape(5, 8, 6, 3)
    assert (decode_rawv(encode_rawv(frames)) == frames).all()
    assert keyframe_indices(10, 4).tolist() == [0, 3, 6, 9]
    assert keyframe_indices(2, 4).tolist() == [0, 1]
    assert keyframe_indices(1, 4).tolist() == [0]
    assert keyframe_indices(7, 1).tolist() == [0]


def test_video_frame_sample_pipeline():
    import ray.data as rd

    from oma_ray.stages.multimodal import (
        VideoFrameSample, decode_rawv, keyframe_indices, ppm_features,
        synth_rawv_batch,
    )

    t = pa.table({"doc_id": pa.array(np.arange(12, dtype=np.int64))})
    ds = rd.from_arrow(t).repartition(3).map_batches(
        synth_rawv_batch, batch_format="pyarrow"
    )
    out = ds.map_batches(
        VideoFrameSample(n_keyframes=3), batch_format="pyarrow", batch_size=4,
        concurrency=2,
    ).to_pandas().sort_values("doc_id")
    assert len(out) == 12
    # recompute one clip's expected features exactly
    row = out.iloc[5]
    payload = row["video"]
    frames = decode_rawv(payload)
    meta = row["video_meta"]
    assert (meta["n_frames"], meta["height"], meta["width"]) == frames.shape[:3]
    idx = keyframe_indices(frames.shape[0], 3)
    assert list(row["keyframe_idx"]) == idx.tolist()
    want = np.stack([ppm_features(frames[j]) for j in idx]).mean(axis=0)
    assert np.allclose(np.array(row["video_features"]), want)


def test_video_codec_seam_is_honest():
    import pytest

    from oma_ray.stages.multimodal import VideoFrameSample

    stage = VideoFrameSample()
    bad = pa.table({"video": pa.array([b"\x00\x00\x00\x18ftypmp42"], type=pa.binary())})
    with pytest.raises(NotImplementedError):
        stage(bad)


def test_video_zero_frame_clip_is_valid():
    from oma_ray.stages.multimodal import VideoFrameSample, encode_rawv

    frames = np.zeros((0, 4, 4, 3), dtype=np.uint8)
    t = pa.table({"video": pa.array([encode_rawv(frames)], type=pa.binary())})
    out = VideoFrameSample(n_keyframes=3)(t)
    meta = out.column("video_meta")[0].as_py()
    assert meta["n_frames"] == 0 and meta["n_sampled"] == 0
    assert list(out.column("keyframe_idx")[0].as_py()) == []


def test_tga_roundtrip_both_orientations():
    import numpy as np

    from oma_ray.stages.multimodal import decode_tga, encode_tga

    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (17, 31), (48, 33), (20, 64)]:
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        for td in (False, True):
            back = decode_tga(encode_tga(img, top_down=td))
            assert back.shape == (h, w, 3)
            assert (back == img).all()


def test_image_decode_dispatches_tga(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from oma_ray.stages.multimodal import ImageDecode, encode_tga

    imgs = []
    for i in range(6):
        h, w = 10 + i, 12 + 2 * i
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([yy % 256, xx % 256, (xx + yy) % 256],
                       axis=-1).astype(np.uint8)
        imgs.append(encode_tga(img, top_down=bool(i % 2)))
    t = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "image": pa.array(imgs, pa.binary())})
    out = (rd.from_arrow(t)
           .map_batches(ImageDecode, concurrency=(1, 2), batch_size=3,
                        batch_format="pyarrow")
           .to_pandas())
    assert len(out) == 6
    for i, m in enumerate(out.sort_values("doc_id")["image_meta"]):
        assert m["height"] == 10 + i and m["width"] == 12 + 2 * i
        assert m["channels"] == 3
