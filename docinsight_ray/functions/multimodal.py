"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with
a ``modality`` tag and struct-ish metadata columns; decode /
feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages sized for large binary rows (small batch_size,
``batch_format="pyarrow"`` so binaries never round-trip through pandas
object dtype).

The real codec libraries (PIL/ffmpeg/torchaudio) are NOT in this
container, so the decode backend is STUBBED: ``backend="fake"`` is a
deterministic byte-level decoder (magic header + histogram features)
and any real backend raises ``NotImplementedError`` at construction.
The Ray-side plumbing — schemas, actor signature, batch sizing, output
layout — is real and tested (tests/test_multimodal.py).

No media exists in the driver tables, so ``synthesize_media`` derives
deterministic payloads from the ``documents`` table (magic prefix per
modality + utf-8 text bytes).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data

MAGIC = {"image": b"IMG0", "audio": b"AUD0", "video": b"VID0"}
_MODALITIES = ["image", "audio", "video"]
N_FEATURES = 16


def synthesize_media(sf_dir: str) -> "ray.data.Dataset":
    """documents → media table (media_id, modality, payload, width,
    height, sample_rate). Deterministic: modality = doc_id % 3."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        modality = [_MODALITIES[i % 3] for i in ids]
        payload = [MAGIC[m] + t.encode("utf-8") for m, t in zip(modality, texts)]
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "modality": pa.array(modality, type=pa.string()),
                "payload": pa.array(payload, type=pa.binary()),
                "width": pa.array([64 + (i % 4) * 32 for i in ids], type=pa.int32()),
                "height": pa.array([64 + (i % 3) * 32 for i in ids], type=pa.int32()),
                "sample_rate": pa.array(
                    [16000 if m == "audio" else 0 for m in modality], type=pa.int32()
                ),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)


class MediaDecoder:
    """Actor-pool decode stage. ``__init__`` loads the (stub) codec once
    per actor; ``__call__`` decodes a batch into fixed-width feature
    vectors. Use small ``batch_size`` (payloads are wide rows)."""

    def __init__(self, backend: str = "fake"):
        if backend != "fake":
            # real backends (PIL / ffmpeg / torchaudio) are not available
            # in this environment; the actor contract is what matters
            raise NotImplementedError(f"media backend {backend!r} not available; use 'fake'")
        self.backend = backend
        # "model load" happens once per actor: histogram bucket edges
        self.edges = np.linspace(0, 256, N_FEATURES + 1)

    def _decode(self, payload: bytes, modality: str) -> np.ndarray:
        magic = MAGIC[modality]
        if not payload.startswith(magic):
            raise ValueError(f"bad {modality} magic in payload")
        body = np.frombuffer(payload, dtype=np.uint8, offset=len(magic))
        hist, _ = np.histogram(body, bins=self.edges)
        return hist.astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._decode(p, m)
            for p, m in zip(batch["payload"].to_pylist(), batch["modality"].to_pylist())
        ]
        f = np.stack(feats) if feats else np.empty((0, N_FEATURES), dtype=np.int64)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "modality": batch["modality"],
                "payload_bytes": pa.array(
                    [len(p) for p in batch["payload"].to_pylist()], type=pa.int64()
                ),
                "features": pa.array(list(f), type=pa.list_(pa.int64(), N_FEATURES)),
                "feat_sum": pa.array(f.sum(axis=1), type=pa.int64()),
            }
        )


class FrameSampler:
    """Video-only stage: deterministic frame sampling plumbing — emits
    one row per sampled 'frame' (fixed stride over the payload)."""

    def __init__(self, stride: int = 1024):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, offs = [], [], []
        for mid, m, p in zip(
            batch["media_id"].to_pylist(), batch["modality"].to_pylist(), batch["payload"].to_pylist()
        ):
            if m != "video":
                continue
            for fi, off in enumerate(range(len(MAGIC[m]), len(p), self.stride)):
                ids.append(mid)
                frames.append(fi)
                offs.append(off)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(frames, type=pa.int32()),
                "byte_offset": pa.array(offs, type=pa.int64()),
            }
        )


def q_multimodal_features(sf_dir: str) -> pa.Table:
    """Decode pipeline: synthesize → actor-pool decode → features
    (rows-only check; determinism + schema tested in pytest)."""
    out = (
        synthesize_media(sf_dir)
        .map_batches(MediaDecoder, fn_constructor_args=("fake",),
                     batch_format="pyarrow", batch_size=64, concurrency=2)
        .drop_columns(["features"])  # fixed-size-list column kept out of the flat gate output
        .to_pandas()
    )
    return pa.Table.from_pandas(out, preserve_index=False)


ORACLE_SQL: dict[str, str] = {
    # q_multimodal_features: payload length IS SQL-expressible on the
    # fake backend: magic(4) + strlen(text)
    "multimodal_features": """
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
               4 + strlen(text)::BIGINT AS payload_bytes,
               strlen(text)::BIGINT AS feat_sum
        FROM documents
    """,
}

QUERIES = {
    "multimodal_features": q_multimodal_features,
}
