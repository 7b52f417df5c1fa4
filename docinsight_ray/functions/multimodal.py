"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with
a ``modality`` tag and struct-ish metadata columns; decode /
feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages sized for large binary rows (small batch_size,
``batch_format="pyarrow"`` so binaries never round-trip through pandas
object dtype).

Two decode backends:

- ``backend="stdlib"`` (RealMediaDecoder) — REAL formats decoded with
  the standard library + numpy only: PGM (P5) grayscale images, RIFF/
  WAVE 16-bit PCM audio (stdlib ``wave``), and YUV4MPEG2 (y4m) video.
  Features are genuine signal statistics (image moments + block-mean
  thumbnail, audio RMS / zero-crossings / dominant FFT bin, per-frame
  luma + motion), and ``ImageResizer`` is a real binary→binary resize
  (PGM in, block-mean-downsampled PGM out).
- ``backend="fake"`` (MediaDecoder) — deterministic byte-level stub
  (magic header + histogram), kept for the SQL-checkable gate; heavier
  codecs (JPEG/MP3/H.264 via PIL/ffmpeg/torchaudio) are NOT in this
  container and raise ``NotImplementedError`` at construction.

No media exists in the driver tables, so ``synthesize_media`` /
``synthesize_real_media`` derive deterministic payloads from the
``documents`` table.
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


# --------------------------------------------------------------------------
# REAL formats (stdlib + numpy only): PGM image / WAV audio / Y4M video
# --------------------------------------------------------------------------


def _pgm_encode(img: np.ndarray) -> bytes:
    h, w = img.shape
    return f"P5\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def _pgm_decode(payload: bytes) -> np.ndarray:
    """Minimal P5 parser (whitespace-separated header, raw 8-bit)."""
    if not payload.startswith(b"P5"):
        raise ValueError("not a P5 PGM payload")
    parts: list[int] = []
    i = 2
    while len(parts) < 3:
        while payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment line
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while not payload[j : j + 1].isspace():
            j += 1
        parts.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = parts
    if maxval > 255:
        raise ValueError("16-bit PGM not supported")
    return np.frombuffer(payload, dtype=np.uint8, offset=i, count=w * h).reshape(h, w)


def _wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def _wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as f:
        sr = f.getframerate()
        samples = np.frombuffer(f.readframes(f.getnframes()), dtype="<i2")
    return samples.astype(np.float64), sr


def _y4m_encode(frames: np.ndarray, fps: int = 25) -> bytes:
    """frames: (n, h, w) uint8 luma → YUV4MPEG2 C420 (flat chroma)."""
    n, h, w = frames.shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode()]
    chroma = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(frames[i].tobytes())
        out.append(chroma)  # U
        out.append(chroma)  # V
    return b"".join(out)


def _y4m_decode(payload: bytes) -> np.ndarray:
    """→ (n_frames, h, w) luma planes."""
    nl = payload.index(b"\n")
    header = payload[:nl].decode()
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    fields = dict((t[0], t[1:]) for t in header.split()[1:])
    w, h = int(fields["W"]), int(fields["H"])
    ysz, csz = h * w, (h // 2) * (w // 2)
    frames = []
    i = nl + 1
    while i < len(payload):
        fe = payload.index(b"\n", i)
        if not payload[i:fe].startswith(b"FRAME"):
            raise ValueError("malformed y4m frame marker")
        i = fe + 1
        frames.append(np.frombuffer(payload, dtype=np.uint8, offset=i, count=ysz).reshape(h, w))
        i += ysz + 2 * csz
    return np.stack(frames) if frames else np.empty((0, h, w), dtype=np.uint8)


def _block_mean_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Real area resize by block averaging (dims must divide evenly —
    the synthesizer guarantees multiples of 16)."""
    h, w = img.shape
    return (
        img.reshape(out_h, h // out_h, out_w, w // out_w)
        .mean(axis=(1, 3))
        .round()
        .astype(np.uint8)
    )


def synthesize_real_media(sf_dir: str) -> "ray.data.Dataset":
    """documents → REAL media payloads, deterministic from doc_id:
    PGM gradient images, WAV sine tones, Y4M moving-bar clips."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        modality, payload, width, height, sr = [], [], [], [], []
        for did in ids:
            m = _MODALITIES[did % 3]
            modality.append(m)
            if m == "image":
                h = w = 16 * (1 + did % 4)  # 16..64, multiples of 16
                yy, xx = np.mgrid[0:h, 0:w]
                img = ((yy * 3 + xx * 5 + did) % 256).astype(np.uint8)
                payload.append(_pgm_encode(img))
                width.append(w); height.append(h); sr.append(0)
            elif m == "audio":
                rate = 8000
                n = 400  # 50 ms
                freq = 200.0 * (1 + did % 8)  # 200..1600 Hz, FFT-bin exact
                t = np.arange(n) / rate
                s = (0.5 * 32767 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
                payload.append(_wav_encode(s, rate))
                width.append(0); height.append(0); sr.append(rate)
            else:
                h = w = 16
                nf = 2 + did % 3
                frames = np.zeros((nf, h, w), dtype=np.uint8)
                for fi in range(nf):  # a bar that moves one column per frame
                    frames[fi, :, (did + fi) % w] = 255
                payload.append(_y4m_encode(frames))
                width.append(w); height.append(h); sr.append(0)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "modality": pa.array(modality, type=pa.string()),
                "payload": pa.array(payload, type=pa.binary()),
                "width": pa.array(width, type=pa.int32()),
                "height": pa.array(height, type=pa.int32()),
                "sample_rate": pa.array(sr, type=pa.int32()),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)


class RealMediaDecoder:
    """Actor-pool decode of REAL formats (stdlib + numpy): PGM / WAV /
    Y4M → genuine signal features. Setup once per actor; small
    batch_size (wide binary rows)."""

    def __init__(self):
        self.thumb = 4  # image thumbnail side

    def _features(self, payload: bytes, modality: str) -> tuple[int, list[float]]:
        if modality == "image":
            img = _pgm_decode(payload)
            t = _block_mean_resize(img, self.thumb, self.thumb).astype(np.float64)
            return img.size, [float(img.mean()), float(img.std())] + list(t.ravel())
        if modality == "audio":
            s, sr = _wav_decode(payload)
            rms = float(np.sqrt(np.mean(s**2)))
            zc = int(np.count_nonzero(np.diff(np.signbit(s))))
            spec = np.abs(np.fft.rfft(s))
            dom_hz = float(np.argmax(spec) * sr / s.size)
            return s.size, [rms, float(zc), dom_hz]
        frames = _y4m_decode(payload)  # video
        luma = frames.mean(axis=(1, 2))
        motion = (
            float(np.abs(np.diff(frames.astype(np.int16), axis=0)).mean())
            if len(frames) > 1 else 0.0
        )
        return int(frames.shape[0]), [float(luma.mean()), motion]

    def __call__(self, batch: pa.Table) -> pa.Table:
        units, feats = [], []
        for p, m in zip(batch["payload"].to_pylist(), batch["modality"].to_pylist()):
            n, f = self._features(p, m)
            units.append(n)
            feats.append([round(x, 6) for x in f])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "modality": batch["modality"],
                # pixels / samples / frames, per modality
                "n_units": pa.array(units, type=pa.int64()),
                "features": pa.array(feats, type=pa.list_(pa.float64())),
            }
        )


def resize_images(batch: pa.Table, out_side: int = 16) -> pa.Table:
    """Real binary→binary resize stage: PGM in, block-mean-downsampled
    PGM out (non-image rows pass through untouched). Stateless, so it
    runs as a task-pool map_batches — stacking a second ACTOR pool in
    front of the decoder would pin 2×concurrency CPUs and can starve a
    small session."""
    out = []
    for p, m in zip(batch["payload"].to_pylist(), batch["modality"].to_pylist()):
        if m == "image":
            img = _pgm_decode(p)
            p = _pgm_encode(_block_mean_resize(img, out_side, out_side))
        out.append(p)
    return batch.set_column(
        batch.column_names.index("payload"), "payload", pa.array(out, type=pa.binary())
    )


def q_multimodal_real(sf_dir: str) -> pa.Table:
    """REAL-format decode pipeline: synthesize PGM/WAV/Y4M → resize
    images → actor-pool stdlib decode → per-media features (rows-only
    gate: binary codecs are not SQL-expressible; determinism + signal
    ground truth asserted in pytest)."""
    out = (
        synthesize_real_media(sf_dir)
        .map_batches(resize_images, batch_format="pyarrow", batch_size=64)
        .map_batches(RealMediaDecoder, batch_format="pyarrow",
                     batch_size=64, concurrency=2)
        .drop_columns(["features"])  # variable-length list kept out of the flat gate output
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out.sort_values("media_id").reset_index(drop=True), preserve_index=False
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
    "multimodal_real": q_multimodal_real,  # rows-only (binary codecs aren't SQL)
}
