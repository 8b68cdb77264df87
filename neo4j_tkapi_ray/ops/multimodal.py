"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool map_batches stages.

The decode kernels are STUBS (no image/audio libraries in this container):
``decode=\"fake\"`` runs a deterministic metadata-only fake so the Ray-side
plumbing (schema, batch sizing, actor signature, output layout) is real and
tested; ``decode=\"real\"`` raises NotImplementedError at the exact seam
where PIL/ffmpeg would plug in.
"""

from __future__ import annotations

import zlib
from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("kind", pa.string()),           # image | audio | video
    ("payload", pa.binary()),        # opaque encoded bytes
    ("meta", pa.string()),           # JSON sidecar metadata
])


def synth_media_dataset(n: int = 64, seed: int = 3) -> rd.Dataset:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = rng.bytes(256 + (i % 7) * 128)
        rows.append({"media_id": f"m{i:05d}", "kind": kind,
                     "payload": payload, "meta": "{}"})
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))


class MediaDecodeActor:
    """Actor-pool stage: expensive codec/model init happens ONCE here.

    Real implementation seam: __init__ would load PIL / torchaudio / ffmpeg
    handles; __call__ would decode payload bytes per row (small batch_size —
    payloads are wide).
    """

    def __init__(self, decode: str = "fake", target_size: int = 64):
        if decode not in ("fake", "real"):
            raise ValueError(decode)
        self.decode = decode
        self.target_size = target_size
        if decode == "real":
            # the seam where the codec libraries would load:
            raise NotImplementedError(
                "real media decode requires PIL/ffmpeg, not present in this "
                "environment — run with decode='fake'")

    def _fake_features(self, payload: bytes) -> np.ndarray:
        # deterministic pseudo-features: crc-seeded, mimics an embedding
        seed = zlib.crc32(payload)
        rng = np.random.RandomState(seed)
        return rng.rand(8).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, widths, heights, ok = [], [], [], []
        for payload in batch.column("payload").to_pylist():
            f = self._fake_features(payload)
            feats.append(f.tolist())
            widths.append(self.target_size)
            heights.append(self.target_size)
            ok.append(True)
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "features": pa.array(feats, pa.list_(pa.float32())),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "decoded": pa.array(ok, pa.bool_()),
        })


def decode_media(ds: rd.Dataset, decode: str = "fake", batch_size: int = 16,
                 concurrency: int = 2) -> rd.Dataset:
    """Wide binary payloads -> SMALL batches (ray_guide memory-aware rule:
    batch_size x concurrency x payload must fit the worker heap)."""
    return ds.map_batches(
        MediaDecodeActor,
        fn_constructor_kwargs={"decode": decode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


def frame_sample(ds: rd.Dataset, every_n: int = 2) -> rd.Dataset:
    """Video frame-sampling stub: explodes each video row into sampled frame
    rows (deterministic count derived from payload size — the real version
    would demux with ffmpeg)."""
    def fn(batch: pa.Table) -> pa.Table:
        mids, idxs, payloads = [], [], []
        for mid, kind, payload in zip(batch.column("media_id").to_pylist(),
                                      batch.column("kind").to_pylist(),
                                      batch.column("payload").to_pylist()):
            if kind != "video":
                continue
            n_frames = max(1, len(payload) // 128)
            for i in range(0, n_frames, every_n):
                mids.append(mid)
                idxs.append(i)
                payloads.append(payload[i * 16:(i + 1) * 16])
        return pa.table({"media_id": pa.array(mids, pa.string()),
                         "frame_idx": pa.array(idxs, pa.int32()),
                         "frame_bytes": pa.array(payloads, pa.binary())})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=16)
