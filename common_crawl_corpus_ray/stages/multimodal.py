"""Multimodal columns: images/video as opaque binary + typed metadata.

The audio path (audio/codecs.py) is fully real — numpy G.711/PCM codecs.
Image/video codec libraries are NOT available in this environment, so the
*decode* kernels here are stubbed two ways, clearly marked:

  * format "raw-rgb8": a real decoder for raw interleaved RGB8 bytes
    (h*w*3), plus the deterministic synth generator below — so resize /
    feature-extract / frame-sample run on real pixel data end-to-end.
  * any other format (jpeg/png/h264/...): NotImplementedError("codec libs
    unavailable in this build") — the Ray-side plumbing (schema, actor
    signature, batch sizing, output layout) is identical, so swapping in a
    real library is a one-function change inside the actor __init__.

All stages are actor-pool ``map_batches`` classes: per-actor setup in
__init__, vectorized numpy work per batch. Batches stay SMALL (payload
rows are wide); callers pass batch_size in the 32-256 range.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

IMAGE_SCHEMA = pa.schema([
    ("item_id", pa.string()),
    ("bytes", pa.binary()),       # encoded payload
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("format", pa.string()),      # "raw-rgb8" | "jpeg" | ...
])

VIDEO_SCHEMA = pa.schema([
    ("item_id", pa.string()),
    ("bytes", pa.binary()),       # concatenated raw frames (stub container)
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("n_frames", pa.int32()),
    ("format", pa.string()),      # "rawframes-rgb8" | "h264" | ...
])


def decode_rgb8(payload: bytes, width: int, height: int) -> np.ndarray:
    """Real decoder for the raw-rgb8 stub format: interleaved uint8 HxWx3."""
    a = np.frombuffer(payload, dtype=np.uint8)
    return a.reshape(height, width, 3)


def _unsupported(fmt: str):
    raise NotImplementedError(
        f"image/video codec {fmt!r}: codec libraries are unavailable in "
        "this build — only the 'raw-rgb8'/'rawframes-rgb8' stub formats "
        "decode. Swap a real decoder into the stage __init__ to enable.")


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (vectorized index gather)."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h // out_h)
    ci = (np.arange(out_w) * w // out_w)
    return img[ri[:, None], ci[None, :]]


class ImageDecodeResize:
    """Actor stage: decode -> resize -> re-encode raw-rgb8.

    Output keeps the input columns with ``bytes``/``width``/``height``
    replaced by the resized image (same layout contract a real thumbnailing
    stage would have)."""

    def __init__(self, out_h: int = 32, out_w: int = 32):
        self.out_h, self.out_w = out_h, out_w

    def __call__(self, b: pa.Table) -> pa.Table:
        out_bytes = []
        for payload, w, h, fmt in zip(b["bytes"].to_pylist(),
                                      b["width"].to_pylist(),
                                      b["height"].to_pylist(),
                                      b["format"].to_pylist()):
            if fmt != "raw-rgb8":
                _unsupported(fmt)
            img = decode_rgb8(payload, w, h)
            out_bytes.append(resize_nearest(img, self.out_h, self.out_w)
                             .tobytes())
        n = b.num_rows
        t = b.set_column(b.schema.get_field_index("bytes"), "bytes",
                         pa.array(out_bytes, pa.binary()))
        t = t.set_column(t.schema.get_field_index("width"), "width",
                         pa.array([self.out_w] * n, pa.int32()))
        return t.set_column(t.schema.get_field_index("height"), "height",
                            pa.array([self.out_h] * n, pa.int32()))


class ImageFeatures:
    """Actor stage: decode -> per-channel mean/std feature vector
    (embedding column, list<float>) — the shape a model-embedding stage
    would emit; here the 'model' is deterministic channel statistics."""

    def __call__(self, b: pa.Table) -> pa.Table:
        feats = []
        for payload, w, h, fmt in zip(b["bytes"].to_pylist(),
                                      b["width"].to_pylist(),
                                      b["height"].to_pylist(),
                                      b["format"].to_pylist()):
            if fmt != "raw-rgb8":
                _unsupported(fmt)
            img = decode_rgb8(payload, w, h).astype(np.float32) / 255.0
            feats.append(np.concatenate([img.mean(axis=(0, 1)),
                                         img.std(axis=(0, 1))]).tolist())
        return pa.table({
            "item_id": b["item_id"],
            "embedding": pa.array(feats, pa.list_(pa.float32()))})


class FrameSample:
    """Actor stage for video: deterministically sample k evenly-spaced
    frames and emit one row per sampled frame (a flat-map: more rows out
    than in). Stub container 'rawframes-rgb8' = concatenated raw frames."""

    def __init__(self, k: int = 4):
        self.k = k

    def __call__(self, b: pa.Table) -> pa.Table:
        ids, frame_idx, frames, ws, hs = [], [], [], [], []
        for item, payload, w, h, nf, fmt in zip(
                b["item_id"].to_pylist(), b["bytes"].to_pylist(),
                b["width"].to_pylist(), b["height"].to_pylist(),
                b["n_frames"].to_pylist(), b["format"].to_pylist()):
            if fmt != "rawframes-rgb8":
                _unsupported(fmt)
            frame_size = w * h * 3
            take = np.linspace(0, nf - 1, num=min(self.k, nf)).astype(int)
            for fi in np.unique(take):
                ids.append(item)
                frame_idx.append(int(fi))
                frames.append(payload[fi * frame_size:(fi + 1) * frame_size])
                ws.append(w)
                hs.append(h)
        return pa.table({
            "item_id": pa.array(ids, pa.string()),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "bytes": pa.array(frames, pa.binary()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "format": pa.array(["raw-rgb8"] * len(ids), pa.string())})


# --- deterministic synth (fixtures for the stub formats) -------------------

def synth_images(ids: list[str], width: int = 48, height: int = 48) -> pa.Table:
    """Seed-per-id random RGB images in the raw-rgb8 stub format."""
    import zlib
    rows = {"item_id": [], "bytes": [], "width": [], "height": [], "format": []}
    for i in ids:
        rng = np.random.default_rng(zlib.crc32(f"img:{i}".encode()))
        img = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
        rows["item_id"].append(i)
        rows["bytes"].append(img.tobytes())
        rows["width"].append(width)
        rows["height"].append(height)
        rows["format"].append("raw-rgb8")
    return pa.table(rows, schema=IMAGE_SCHEMA)


def synth_videos(ids: list[str], width: int = 16, height: int = 16,
                 n_frames: int = 12) -> pa.Table:
    import zlib
    rows = {"item_id": [], "bytes": [], "width": [], "height": [],
            "n_frames": [], "format": []}
    for i in ids:
        rng = np.random.default_rng(zlib.crc32(f"vid:{i}".encode()))
        v = rng.integers(0, 256, size=(n_frames, height, width, 3),
                         dtype=np.uint8)
        rows["item_id"].append(i)
        rows["bytes"].append(v.tobytes())
        rows["width"].append(width)
        rows["height"].append(height)
        rows["n_frames"].append(n_frames)
        rows["format"].append("rawframes-rgb8")
    return pa.table(rows, schema=VIDEO_SCHEMA)
