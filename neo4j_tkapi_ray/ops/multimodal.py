"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool map_batches stages.

Two decode modes:

  * ``decode="real"`` — pure-Python byte-level codecs for the two formats
    the synthetic corpus emits: BMP (24-bit uncompressed, BITMAPINFOHEADER)
    and WAV (canonical RIFF PCM16 mono). Real header parsing, real pixel /
    sample statistics — no image/audio libraries needed. Video payloads
    use a private container (see ``synth_media_rows``) and decode to frame
    counts. Formats outside these raise at the documented seam where
    PIL/ffmpeg would plug in.
  * ``decode="fake"`` — deterministic metadata-only fake for arbitrary
    bytes (kept for plumbing tests with non-decodable payloads).

The Ray-side layout follows the memory-aware rule for wide binary rows:
small ``batch_size`` x actor ``concurrency`` so payloads fit worker heaps.
"""

from __future__ import annotations

import json
import math
import struct
import zlib
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("kind", pa.string()),           # image | audio | video
    ("payload", pa.binary()),        # opaque encoded bytes
    ("meta", pa.string()),           # JSON sidecar metadata
])

DECODED_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("kind", pa.string()),
    ("features", pa.list_(pa.float32())),
    ("width", pa.int32()),           # image: pixels; audio: sample_rate
    ("height", pa.int32()),          # image: pixels; audio: n_samples
    ("duration_s", pa.float64()),    # audio/video; 0.0 for images
    ("decoded", pa.bool_()),
])

_VIDEO_MAGIC = b"NTRV"


# ---------------------------------------------------------------------------
# encoders (synthetic corpus side) — valid bytes for the real decoders
# ---------------------------------------------------------------------------

def encode_bmp(width: int, height: int, seed: int) -> bytes:
    """Minimal valid 24bpp bottom-up BMP (BITMAPFILEHEADER + INFOHEADER)."""
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    pixel_bytes = (row_bytes + pad) * height
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + pixel_bytes, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       pixel_bytes, 2835, 2835, 0, 0)
    rows = []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            v = (seed + 7 * x + 13 * y) % 256
            row += bytes((v, (v * 3) % 256, (v * 5) % 256))  # B, G, R
        row += b"\x00" * pad
        rows.append(bytes(row))
    return header + info + b"".join(rows)


def encode_wav(n_samples: int, sample_rate: int, freq_hz: float) -> bytes:
    """Canonical RIFF/WAVE, PCM16 mono, one sine tone."""
    samples = np.round(12000 * np.sin(
        2 * math.pi * freq_hz * np.arange(n_samples) / sample_rate)
    ).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def encode_video(n_frames: int, fps: int, seed: int) -> bytes:
    """Private demo container: magic, n_frames, fps, then 16-byte frames."""
    frames = bytes((seed + i) % 256 for i in range(n_frames * 16))
    return _VIDEO_MAGIC + struct.pack("<II", n_frames, fps) + frames


# ---------------------------------------------------------------------------
# decoders (pure byte-level, no libraries)
# ---------------------------------------------------------------------------

def decode_bmp(payload: bytes) -> Tuple[int, int, List[float]]:
    """Parse a 24bpp BMP; returns (width, height, mean [B, G, R])."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)[:2]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp}")
    height = abs(height)
    row_bytes = width * 3
    stride = row_bytes + ((4 - row_bytes % 4) % 4)
    px = np.frombuffer(payload, dtype=np.uint8,
                       count=stride * height, offset=off)
    px = px.reshape(height, stride)[:, :row_bytes].reshape(height, width, 3)
    means = px.astype(np.float64).mean(axis=(0, 1))
    return width, height, [float(m) for m in means]


def decode_wav(payload: bytes) -> Tuple[int, int, float, float]:
    """Parse canonical RIFF PCM16 mono; returns (sample_rate, n_samples,
    duration_s, rms)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    sample_rate, data = None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            _fmt, _ch, sample_rate = struct.unpack_from("<HHI", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2").astype(np.float64)
    n = len(samples)
    rms = float(np.sqrt((samples ** 2).mean())) if n else 0.0
    return int(sample_rate), n, n / sample_rate, rms


def decode_video_container(payload: bytes) -> Tuple[int, int, float]:
    if payload[:4] != _VIDEO_MAGIC:
        raise ValueError("not an NTRV payload")
    n_frames, fps = struct.unpack_from("<II", payload, 4)
    return n_frames, fps, n_frames / max(1, fps)


def decode_one(kind: str, payload: bytes) -> dict:
    """Shared per-row real-decode kernel (also the single-process oracle)."""
    if kind == "image":
        w, h, means = decode_bmp(payload)
        feats = [round(m, 4) for m in means] + [float(w), float(h), 0.0, 0.0, 0.0]
        return {"features": feats[:8], "width": w, "height": h,
                "duration_s": 0.0, "decoded": True}
    if kind == "audio":
        rate, n, dur, rms = decode_wav(payload)
        feats = [round(rms, 4), float(n), float(rate), round(dur, 4),
                 0.0, 0.0, 0.0, 0.0]
        return {"features": feats, "width": rate, "height": n,
                "duration_s": round(dur, 6), "decoded": True}
    if kind == "video":
        n_frames, fps, dur = decode_video_container(payload)
        feats = [float(n_frames), float(fps), round(dur, 4), 0.0, 0.0, 0.0,
                 0.0, 0.0]
        return {"features": feats, "width": fps, "height": n_frames,
                "duration_s": round(dur, 6), "decoded": True}
    raise NotImplementedError(
        f"no pure-python decoder for kind={kind!r} — this is the seam where "
        "PIL/ffmpeg would plug in")


# ---------------------------------------------------------------------------
# synthetic media corpus
# ---------------------------------------------------------------------------

def synth_media_rows(n: int = 64, seed: int = 3) -> List[dict]:
    """Deterministic fake media table with VALID payloads (BMP/WAV/NTRV)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        s = seed + i
        if kind == "image":
            w, h = 8 + (i % 5) * 4, 6 + (i % 3) * 4
            payload = encode_bmp(w, h, s)
            meta = {"format": "bmp", "width": w, "height": h}
        elif kind == "audio":
            ns, rate = 800 + (i % 7) * 160, 8000
            payload = encode_wav(ns, rate, 220.0 + 20 * (i % 5))
            meta = {"format": "wav", "sample_rate": rate, "n_samples": ns}
        else:
            nf, fps = 4 + (i % 6) * 2, 10
            payload = encode_video(nf, fps, s)
            meta = {"format": "ntrv", "n_frames": nf, "fps": fps}
        rows.append({"media_id": f"m{i:05d}", "kind": kind,
                     "payload": payload, "meta": json.dumps(meta, sort_keys=True)})
    return rows


def synth_media_dataset(n: int = 64, seed: int = 3) -> rd.Dataset:
    return rd.from_arrow(pa.Table.from_pylist(synth_media_rows(n, seed),
                                              schema=MEDIA_SCHEMA))


# ---------------------------------------------------------------------------
# actor-pool decode stage
# ---------------------------------------------------------------------------

class MediaDecodeActor:
    """Actor-pool stage: per-actor init once, per-batch byte-level decode.

    Real implementation seam: for formats beyond BMP/WAV/NTRV, __init__
    would load PIL / torchaudio / ffmpeg handles."""

    def __init__(self, decode: str = "real", target_size: int = 64):
        if decode not in ("fake", "real"):
            raise ValueError(decode)
        self.decode = decode
        self.target_size = target_size

    def _fake_features(self, payload: bytes) -> np.ndarray:
        # deterministic pseudo-features: crc-seeded, mimics an embedding
        seed = zlib.crc32(payload)
        rng = np.random.RandomState(seed)
        return rng.rand(8).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for mid, kind, payload in zip(batch.column("media_id").to_pylist(),
                                      batch.column("kind").to_pylist(),
                                      batch.column("payload").to_pylist()):
            if self.decode == "real":
                try:
                    d = decode_one(kind, payload)
                except (ValueError, NotImplementedError, struct.error):
                    d = {"features": [0.0] * 8, "width": 0, "height": 0,
                         "duration_s": 0.0, "decoded": False}
            else:
                d = {"features": self._fake_features(payload).tolist(),
                     "width": self.target_size, "height": self.target_size,
                     "duration_s": 0.0, "decoded": True}
            rows.append({"media_id": mid, "kind": kind, **d})
        if not rows:
            return DECODED_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=DECODED_SCHEMA)


def decode_media(ds: rd.Dataset, decode: str = "real", batch_size: int = 16,
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


def frame_sample_rows(mid: str, kind: str, payload: bytes,
                      every_n: int = 2) -> List[dict]:
    """Per-row frame sampling kernel (shared with the oracle): real NTRV
    frame count when the container parses, size-derived fallback otherwise."""
    if kind != "video":
        return []
    try:
        n_frames, _fps, _dur = decode_video_container(payload)
        frame_data = payload[12:]
    except (ValueError, struct.error):
        n_frames = max(1, len(payload) // 128)
        frame_data = payload
    out = []
    for i in range(0, n_frames, every_n):
        out.append({"media_id": mid, "frame_idx": i,
                    "frame_bytes": frame_data[i * 16:(i + 1) * 16]})
    return out


def frame_sample(ds: rd.Dataset, every_n: int = 2) -> rd.Dataset:
    """Video frame sampling: explodes each video row into sampled frame
    rows (flat-map-shaped map_batches)."""
    def fn(batch: pa.Table) -> pa.Table:
        rows = []
        for mid, kind, payload in zip(batch.column("media_id").to_pylist(),
                                      batch.column("kind").to_pylist(),
                                      batch.column("payload").to_pylist()):
            rows.extend(frame_sample_rows(mid, kind, payload, every_n))
        schema = pa.schema([("media_id", pa.string()),
                            ("frame_idx", pa.int32()),
                            ("frame_bytes", pa.binary())])
        if not rows:
            return schema.empty_table()
        return pa.Table.from_pylist(rows, schema=schema)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=16)


def hex_binary_view(ds: rd.Dataset, columns: dict[str, str]) -> rd.Dataset:
    """Presentation-layer view for query surfaces: replace raw ``binary``
    columns with lowercase-hex strings (``columns`` maps binary column ->
    hex column name). Raw bytes stay internal-stage-only; anything exposed
    to a SQL-comparable query surface must be sortable/hashable (the
    driver's canonicalizer dies on bytearray cells — CORRECTNESS_r03
    media_frames/media_resize). Mirrors DuckDB ``lower(to_hex(b))``."""
    def fn(batch: pa.Table) -> pa.Table:
        for src, dst in columns.items():
            idx = batch.schema.get_field_index(src)
            hexed = pa.array(
                [None if v is None else v.hex()
                 for v in batch.column(src).to_pylist()], type=pa.string())
            batch = batch.set_column(idx, dst, hexed)
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# resize (real nearest-neighbor over the decoded BMP pixel grid)
# ---------------------------------------------------------------------------

def _bmp_pixels(payload: bytes) -> np.ndarray:
    """24bpp BMP -> (height, width, 3) uint8 array in stored row order."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)[:2]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp}")
    height = abs(height)
    row_bytes = width * 3
    stride = row_bytes + ((4 - row_bytes % 4) % 4)
    px = np.frombuffer(payload, dtype=np.uint8,
                       count=stride * height, offset=off)
    return px.reshape(height, stride)[:, :row_bytes].reshape(height, width, 3)


def encode_bmp_pixels(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 array -> valid 24bpp BMP bytes (vectorized)."""
    h, w, _ = px.shape
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    pixel_bytes = (row_bytes + pad) * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + pixel_bytes, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       pixel_bytes, 2835, 2835, 0, 0)
    flat = px.reshape(h, row_bytes)
    if pad:
        flat = np.concatenate(
            [flat, np.zeros((h, pad), dtype=np.uint8)], axis=1)
    return header + info + flat.tobytes()


def resize_bmp(payload: bytes, tw: int, th: int) -> Tuple[bytes, List[float]]:
    """Nearest-neighbor resize kernel (shared with the oracle): floor index
    map (yi = i*h//th), re-encoded as a valid BMP. Returns (bytes, BGR
    means of the RESIZED image rounded to 4)."""
    px = _bmp_pixels(payload)
    h, w, _ = px.shape
    yi = (np.arange(th, dtype=np.int64) * h) // th
    xi = (np.arange(tw, dtype=np.int64) * w) // tw
    out = np.ascontiguousarray(px[yi][:, xi])
    means = out.astype(np.float64).mean(axis=(0, 1))
    return encode_bmp_pixels(out), [round(float(m), 4) for m in means]


RESIZED_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("payload", pa.binary()),        # resized, re-encoded BMP
    ("mean_b", pa.float64()),
    ("mean_g", pa.float64()),
    ("mean_r", pa.float64()),
    ("resized", pa.bool_()),
])


def resize_rows(mid: str, kind: str, payload: bytes,
                target: int = 16) -> List[dict]:
    """Per-row resize kernel (shared with the oracle). Images only;
    undecodable payloads emit a resized=False marker row."""
    if kind != "image":
        return []
    try:
        out, means = resize_bmp(payload, target, target)
    except (ValueError, struct.error):
        return [{"media_id": mid, "width": 0, "height": 0, "payload": b"",
                 "mean_b": 0.0, "mean_g": 0.0, "mean_r": 0.0,
                 "resized": False}]
    return [{"media_id": mid, "width": target, "height": target,
             "payload": out, "mean_b": means[0], "mean_g": means[1],
             "mean_r": means[2], "resized": True}]


class MediaResizeActor:
    """Actor-pool resize stage: target geometry fixed per actor in
    __init__; per-batch vectorized pixel work in __call__. Same wide-row
    memory rule as decode: small batch_size x concurrency."""

    def __init__(self, target: int = 16):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for mid, kind, payload in zip(batch.column("media_id").to_pylist(),
                                      batch.column("kind").to_pylist(),
                                      batch.column("payload").to_pylist()):
            rows.extend(resize_rows(mid, kind, payload, self.target))
        if not rows:
            return RESIZED_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=RESIZED_SCHEMA)


def resize_images(ds: rd.Dataset, target: int = 16, batch_size: int = 16,
                  concurrency: int = 2) -> rd.Dataset:
    return ds.map_batches(
        MediaResizeActor,
        fn_constructor_kwargs={"target": target},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


# ---------------------------------------------------------------------------
# audio window energy (feature extraction over WAV payloads)
# ---------------------------------------------------------------------------

def _wav_samples(payload: bytes) -> Tuple[int, np.ndarray]:
    """Parse canonical RIFF PCM16 mono; returns (sample_rate, int64
    samples). Same chunk walk as decode_wav, exposing the raw samples."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    sample_rate, data = None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            _fmt, _ch, sample_rate = struct.unpack_from("<HHI", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return int(sample_rate), np.frombuffer(data, dtype="<i2").astype(np.int64)


def audio_window_rows(mid: str, kind: str, payload: bytes,
                      window: int = 1024) -> List[dict]:
    """Per-row windowed audio-energy kernel (shared with the expected-table
    oracle, like frame_sample_rows): PCM16 samples in fixed windows of
    ``window`` samples (last window ragged); per window the EXACT int64
    energy (sum of squares — max |s|=32768 ⇒ safe past 8e9 samples per
    window) and peak |amplitude|. The VAD/loudness-segmentation feature
    pass of an audio training-data pipeline, integer-exact for the hash
    gate."""
    if kind != "audio":
        return []
    try:
        _rate, samples = _wav_samples(payload)
    except (ValueError, struct.error):
        return []
    out = []
    for w, s in enumerate(range(0, len(samples), window)):
        chunk = samples[s:s + window]
        out.append({"media_id": mid, "window_idx": w,
                    "n_samples": int(len(chunk)),
                    "energy": int((chunk * chunk).sum()),
                    "peak": int(np.abs(chunk).max()) if len(chunk) else 0})
    return out


def audio_windows(ds: rd.Dataset, window: int = 1024) -> rd.Dataset:
    """Windowed audio energy over the media table: explodes each WAV row
    into per-window feature rows (flat-map-shaped map_batches; the
    per-row Python IS the codec walk, the window math is numpy). Small
    batch_size — media rows are payload-wide, same sizing note as
    decode_media."""
    def fn(batch: pa.Table) -> pa.Table:
        rows = []
        for mid, kind, payload in zip(batch.column("media_id").to_pylist(),
                                      batch.column("kind").to_pylist(),
                                      batch.column("payload").to_pylist()):
            rows.extend(audio_window_rows(mid, kind, payload, window))
        schema = pa.schema([("media_id", pa.string()),
                            ("window_idx", pa.int64()),
                            ("n_samples", pa.int64()),
                            ("energy", pa.int64()),
                            ("peak", pa.int64())])
        if not rows:
            return schema.empty_table()
        return pa.Table.from_pylist(rows, schema=schema)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=16)
