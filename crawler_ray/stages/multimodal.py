"""Multimodal (image/audio/video) column stages — real Ray plumbing,
stubbed codecs.

Media payloads are opaque ``binary`` columns with typed metadata
(media_ref, media_type, n_bytes); decode / resize / feature-extract /
frame-sample are actor-pool ``map_batches`` stages sized for large
binary rows (small ``batch_size``, arrow-native columns).  The actual
codec libraries (PIL/ffmpeg/torchaudio) are not available in this
container, so the decode kernels are deterministic fakes behind
``decode_backend="fake"`` — swapping in a real backend changes ONE
method, not the pipeline (schemas, batch sizes, actor signatures and
output layout are the tested, real part).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("media_type", pa.string()),  # image/jpeg, audio/wav, video/mp4 …
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image/jpeg", "audio/wav", "video/mp4"]
    refs, types, payloads = [], [], []
    for i in range(n):
        t = kinds[i % 3]
        body = rng.integers(0, 256, size=int(rng.integers(256, 4096)), dtype=np.uint8)
        refs.append(f"media/{i:05d}.{t.split('/')[1]}")
        types.append(t)
        payloads.append(body.tobytes())
    return pa.table(
        {
            "media_ref": pa.array(refs),
            "media_type": pa.array(types),
            "payload": pa.array(payloads, type=pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
        }
    )


class ImageDecodeStage:
    """binary payload → (height, width, channels) + thumbnail feature.

    Real backend would be PIL/turbojpeg loaded once in __init__; the
    fake derives deterministic dims/features from a payload digest, so
    the distributed plumbing is testable end-to-end."""

    def __init__(self, decode_backend: str = "fake", thumb: int = 8):
        if decode_backend != "fake":
            raise NotImplementedError(
                "only the deterministic 'fake' codec backend exists in this "
                "environment; plug a real decoder here (PIL.Image.open)"
            )
        self.thumb = thumb

    def _decode(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        d = hashlib.blake2b(payload, digest_size=16).digest()
        h = 64 + d[0] % 192
        w = 64 + d[1] % 192
        rng = np.random.default_rng(int.from_bytes(d[2:10], "little"))
        thumb = rng.random((self.thumb * self.thumb,), dtype=np.float32)
        return h, w, thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs, ws, feats = [], [], []
        for p, t in zip(batch["payload"].to_pylist(), batch["media_type"].to_pylist()):
            if not (t or "").startswith("image/"):
                hs.append(None)
                ws.append(None)
                feats.append(None)
                continue
            h, w, f = self._decode(p)
            hs.append(h)
            ws.append(w)
            feats.append(f.tolist())
        return (
            batch.drop_columns(["payload"])
            .append_column("height", pa.array(hs, type=pa.int32()))
            .append_column("width", pa.array(ws, type=pa.int32()))
            .append_column("thumb_feature", pa.array(feats, type=pa.list_(pa.float32())))
        )


class AudioFeatureStage:
    """binary payload → (duration_s, n_frames, mfcc-ish feature vector).
    Fake backend: deterministic from digest."""

    def __init__(self, decode_backend: str = "fake", n_mfcc: int = 13):
        if decode_backend != "fake":
            raise NotImplementedError("plug a real audio decoder here")
        self.n_mfcc = n_mfcc

    def __call__(self, batch: pa.Table) -> pa.Table:
        durs, frames, feats = [], [], []
        for p, t in zip(batch["payload"].to_pylist(), batch["media_type"].to_pylist()):
            if not (t or "").startswith("audio/"):
                durs.append(None)
                frames.append(None)
                feats.append(None)
                continue
            d = hashlib.blake2b(p, digest_size=16).digest()
            dur = 0.5 + (d[0] % 100) / 10.0
            rng = np.random.default_rng(int.from_bytes(d[2:10], "little"))
            durs.append(dur)
            frames.append(int(dur * 16000))
            feats.append(rng.random((self.n_mfcc,), dtype=np.float32).tolist())
        return (
            batch.drop_columns(["payload"])
            .append_column("duration_s", pa.array(durs, type=pa.float64()))
            .append_column("n_frames", pa.array(frames, type=pa.int64()))
            .append_column("audio_feature", pa.array(feats, type=pa.list_(pa.float32())))
        )


class VideoFrameSampleStage:
    """binary payload → k sampled frame digests (stand-in for decoded
    keyframes).  Shows the large-row pattern: tiny batch_size, output
    rows exploded per frame."""

    def __init__(self, decode_backend: str = "fake", k_frames: int = 4):
        if decode_backend != "fake":
            raise NotImplementedError("plug a real video decoder here")
        self.k = k_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, idxs, digests = [], [], []
        for ref, p, t in zip(
            batch["media_ref"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["media_type"].to_pylist(),
        ):
            if not (t or "").startswith("video/"):
                continue
            for i in range(self.k):
                refs.append(ref)
                idxs.append(i)
                digests.append(
                    hashlib.blake2b(p + i.to_bytes(4, "little"), digest_size=8).hexdigest()
                )
        return pa.table(
            {
                "media_ref": pa.array(refs, type=pa.string()),
                "frame_index": pa.array(idxs, type=pa.int32()),
                "frame_digest": pa.array(digests, type=pa.string()),
            }
        )


def decode_images(ds: Dataset, concurrency: int = 2, batch_size: int = 16) -> Dataset:
    """Actor-pool image decode over a media Dataset (small batches —
    batch × concurrency of binary payloads must fit worker heaps)."""
    return ds.map_batches(
        ImageDecodeStage,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
        num_cpus=1,
    )


def audio_features(ds: Dataset, concurrency: int = 2, batch_size: int = 16) -> Dataset:
    return ds.map_batches(
        AudioFeatureStage,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
        num_cpus=1,
    )


def sample_video_frames(ds: Dataset, concurrency: int = 2, batch_size: int = 8) -> Dataset:
    return ds.map_batches(
        VideoFrameSampleStage,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
        num_cpus=1,
    )
