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


def test_real_codecs_roundtrip_and_ground_truth():
    """The stdlib backend decodes REAL formats with analytically known
    signal features: PGM roundtrip + block-mean resize, WAV sine RMS /
    dominant frequency, Y4M frame count + motion."""
    import io
    import wave

    import numpy as np

    from docinsight_ray.functions.multimodal import (
        _block_mean_resize,
        _pgm_decode,
        _pgm_encode,
        _wav_decode,
        _wav_encode,
        _y4m_decode,
        _y4m_encode,
        RealMediaDecoder,
    )

    # PGM roundtrip + resize
    img = (np.arange(32 * 48, dtype=np.int64) % 256).astype(np.uint8).reshape(32, 48)
    assert np.array_equal(_pgm_decode(_pgm_encode(img)), img)
    small = _block_mean_resize(img, 16, 16)
    assert small.shape == (16, 16)
    assert abs(float(small.mean()) - float(img.mean())) < 1.0  # area resize preserves mean

    # WAV: 440 Hz sine at 8 kHz — RMS = A/sqrt(2), dominant bin exact
    sr, n, amp = 8000, 800, 0.5 * 32767
    t = np.arange(n) / sr
    s = (amp * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    payload = _wav_encode(s, sr)
    with wave.open(io.BytesIO(payload), "rb") as f:  # it IS a real WAV
        assert f.getframerate() == sr and f.getnframes() == n
    dec, sr2 = _wav_decode(payload)
    assert sr2 == sr and dec.size == n
    rms = float(np.sqrt(np.mean(dec**2)))
    assert abs(rms - amp / np.sqrt(2)) / (amp / np.sqrt(2)) < 0.01
    spec = np.abs(np.fft.rfft(dec))
    assert abs(np.argmax(spec) * sr / n - 440) < sr / n

    # Y4M: 3 frames, one moving bar — motion = 2 changed columns / frame
    frames = np.zeros((3, 16, 16), dtype=np.uint8)
    for fi in range(3):
        frames[fi, :, fi] = 255
    out = _y4m_decode(_y4m_encode(frames))
    assert np.array_equal(out, frames)
    n_units, feats = RealMediaDecoder()._features(_y4m_encode(frames), "video")
    assert n_units == 3
    assert abs(feats[1] - 2 * 255 / 16) < 1e-6  # mean abs diff per pixel


def test_real_media_pipeline(ray_session):
    """End-to-end stdlib-decode pipeline over the documents table:
    deterministic, schema-stable, one row per media item."""
    import pyarrow.parquet as pq

    from docinsight_ray.functions.multimodal import q_multimodal_real

    sf = "/root/testdata/sf0.001"
    a = q_multimodal_real(sf).to_pandas()
    n_docs = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    assert len(a) == n_docs
    assert list(a.columns) == ["media_id", "modality", "n_units"]
    # images were resized to 16x16 before decode
    assert (a[a.modality == "image"].n_units == 256).all()
    # audio payloads are the synthesized 400-sample tones
    assert (a[a.modality == "audio"].n_units == 400).all()
    assert set(a[a.modality == "video"].n_units) <= {2, 3, 4}
    b = q_multimodal_real(sf).to_pandas()
    assert a.equals(b)
