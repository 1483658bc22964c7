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
