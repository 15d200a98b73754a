"""Multimodal column stages: image/audio/video as opaque binary columns.

The decode libraries (PIL / torchaudio / ffmpeg) are NOT in this container,
so the decode kernels are STUBBED behind import-guards with a deterministic
fake mode — but the Ray-side plumbing is real and tested: schema (binary
payload + typed metadata), stateful actor-pool ``map_batches`` stages with
decoder state in ``__init__``, small batch sizes for large binary rows, and
Arrow-native outputs (fixed-size-list feature vectors).

Production notes baked into the design: ``batch_size`` must be small because
a batch is payload_bytes x batch_size in heap; blocks with wide binary rows
should raise ``DataContext.target_max_block_size`` rather than split
absurdly; these stages are actor pools because real decoders amortize
codec/model init.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),       # image | audio | video
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
        ("meta_duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int, kind: str = "image", seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (opaque bytes + metadata)."""
    rng = np.random.default_rng(seed)
    ids, kinds, mimes, payloads, ws, hs, durs = [], [], [], [], [], [], []
    for i in range(n):
        body = hashlib.sha256(f"{kind}-{seed}-{i}".encode()).digest() * 64
        ids.append(i)
        kinds.append(kind)
        mimes.append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
        payloads.append(body)
        ws.append(int(rng.integers(64, 1024)))
        hs.append(int(rng.integers(64, 1024)))
        durs.append(int(rng.integers(1000, 60000)) if kind != "image" else 0)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "mime": pa.array(mimes, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta_width": pa.array(ws, pa.int32()),
            "meta_height": pa.array(hs, pa.int32()),
            "meta_duration_ms": pa.array(durs, pa.int32()),
        }
    )


class DecodeImageBatch:
    """Actor-pool stage: decode + resize + feature-extract images.

    Real path requires PIL (absent here -> NotImplementedError unless
    ``fake=True``); fake path derives a deterministic 16-dim feature vector
    from the payload hash, exercising identical schema/plumbing."""

    FEATURE_DIM = 16

    def __init__(self, target_size: tuple[int, int] = (224, 224), fake: bool = True):
        self.target_size = target_size
        self.fake = fake
        try:
            from PIL import Image  # noqa: F401

            self._pil = True
        except ImportError:
            self._pil = False
        if not fake and not self._pil:
            raise NotImplementedError(
                "image decode requires PIL, which is not available in this "
                "container; use fake=True for plumbing tests"
            )

    def _features(self, payload: bytes) -> np.ndarray:
        h = hashlib.sha256(payload).digest()
        return (
            np.frombuffer(h[: self.FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
            / 65535.0
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p) for p in batch["payload"].to_pylist()]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "width": pa.array([self.target_size[0]] * batch.num_rows, pa.int32()),
                "height": pa.array([self.target_size[1]] * batch.num_rows, pa.int32()),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.concatenate(feats), pa.float32()), self.FEATURE_DIM
                ),
            }
        )


class AudioFeaturesBatch:
    """Actor-pool stage: windowed audio feature extraction (energy per
    fixed-length window).  Real path requires an audio decoder (absent in
    this container -> NotImplementedError unless ``fake=True``); the fake
    path derives deterministic per-window energies from the payload hash,
    exercising identical schema/plumbing: one row per (media, window) with
    ``window_ms`` event-time offsets — the shape a training pipeline
    windows/aggregates on."""

    def __init__(self, window_ms: int = 1000, fake: bool = True):
        self.window_ms = window_ms
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "audio decode requires torchaudio/ffmpeg, absent in this container"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, widx, wstart, energy = [], [], [], []
        for mid, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["meta_duration_ms"].to_pylist(),
        ):
            n_windows = max(1, int(dur or 1000) // self.window_ms)
            for w in range(n_windows):
                h = hashlib.sha256(payload + w.to_bytes(4, "little")).digest()
                ids.append(mid)
                widx.append(w)
                wstart.append(w * self.window_ms)
                energy.append(int.from_bytes(h[:4], "little") / 2**32)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "window": pa.array(widx, pa.int32()),
                "window_start_ms": pa.array(wstart, pa.int32()),
                "energy": pa.array(energy, pa.float64()),
            }
        )


class SampleFramesBatch:
    """Actor-pool stage: sample N frames per video (stubbed decode)."""

    def __init__(self, n_frames: int = 4, fake: bool = True):
        self.n_frames = n_frames
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "video decode requires ffmpeg, absent in this container"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, ts, frames = [], [], [], []
        for mid, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["meta_duration_ms"].to_pylist(),
        ):
            for f in range(self.n_frames):
                t_ms = int((f + 0.5) * (dur or 1000) / self.n_frames)
                ids.append(mid)
                frame_idx.append(f)
                ts.append(t_ms)
                frames.append(hashlib.sha256(payload + f.to_bytes(4, "little")).digest())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame": pa.array(frame_idx, pa.int32()),
                "ts_ms": pa.array(ts, pa.int32()),
                "frame_bytes": pa.array(frames, pa.binary()),
            }
        )


def decode_images(ds, concurrency: int = 2, batch_size: int = 16, fake: bool = True):
    """The canonical wiring: small batches, actor pool, Arrow in/out."""
    return ds.map_batches(
        DecodeImageBatch,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def audio_features(ds, window_ms: int = 1000, concurrency: int = 2,
                   batch_size: int = 8, fake: bool = True):
    return ds.map_batches(
        AudioFeaturesBatch,
        fn_constructor_kwargs={"window_ms": window_ms, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(ds, n_frames: int = 4, concurrency: int = 2,
                  batch_size: int = 8, fake: bool = True):
    return ds.map_batches(
        SampleFramesBatch,
        fn_constructor_kwargs={"n_frames": n_frames, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
