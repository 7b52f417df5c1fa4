"""Multimodal plumbing tests (decode is a stub; schemas/actors are real)."""

import numpy as np
import pyarrow as pa
import pytest

from docinsight_ray.functions.multimodal import (
    MAGIC,
    N_FEATURES,
    FrameSampler,
    MediaDecoder,
)

SF = "/root/testdata/sf0.001"


def test_real_backend_raises():
    with pytest.raises(NotImplementedError):
        MediaDecoder(backend="pil")


def test_decoder_batch_contract():
    dec = MediaDecoder("fake")
    batch = pa.table(
        {
            "media_id": pa.array([1, 2], type=pa.int64()),
            "modality": pa.array(["image", "audio"]),
            "payload": pa.array([MAGIC["image"] + b"abc", MAGIC["audio"] + b"\x00\xff"], type=pa.binary()),
        }
    )
    out = dec(batch)
    assert out.column_names == ["media_id", "modality", "payload_bytes", "features", "feat_sum"]
    assert out["payload_bytes"].to_pylist() == [7, 6]
    feats = out["features"].to_pylist()
    assert len(feats[0]) == N_FEATURES
    assert out["feat_sum"].to_pylist() == [3, 2]  # body byte counts


def test_decoder_rejects_bad_magic():
    dec = MediaDecoder("fake")
    batch = pa.table(
        {
            "media_id": pa.array([1], type=pa.int64()),
            "modality": pa.array(["image"]),
            "payload": pa.array([b"NOPE" + b"x"], type=pa.binary()),
        }
    )
    with pytest.raises(ValueError):
        dec(batch)


def test_frame_sampler():
    fs = FrameSampler(stride=4)
    batch = pa.table(
        {
            "media_id": pa.array([9], type=pa.int64()),
            "modality": pa.array(["video"]),
            "payload": pa.array([MAGIC["video"] + b"0123456789"], type=pa.binary()),
        }
    )
    out = fs(batch)
    assert out["frame_idx"].to_pylist() == [0, 1, 2]
    assert out["byte_offset"].to_pylist() == [4, 8, 12]


def test_pipeline_deterministic(ray_session):
    from docinsight_ray.functions.multimodal import q_multimodal_features

    a = q_multimodal_features(SF).to_pandas().sort_values("media_id").reset_index(drop=True)
    b = q_multimodal_features(SF).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert a.equals(b)
    assert set(a["modality"]) == {"image", "audio", "video"}
