"""Multimodal media stages: decode / resize / feature-extract /
frame-sample as actor-pool ``map_batches`` stages.

The corpus treats image/audio/video payloads as opaque ``binary``
columns with typed metadata (media_ref, kind, width/height/duration).
``codec="raw"`` (w*h*3 sRGB bytes, the corpus native format) and
``codec="png"`` (pure-stdlib zlib decoder, stages/png.py) are fully
implemented; the remaining compressed codecs (JPEG/WebP/...) raise
``NotImplementedError`` behind an import-try — no codec wheel in this
sandbox — so the Ray-side plumbing — schema, batch sizing, actor
signature, output layout — is real and tested either way.

Scale notes: decoded frames are large → ``batch_size`` 8-32 and
``concurrency × num_cpus`` sized to the node; outputs carry fixed-size
feature vectors / thumbnails, never full frames, so downstream blocks
stay small.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def decode_media(payload: bytes, codec: str, width: int, height: int) -> np.ndarray:
    """binary payload → uint8 [h, w, 3].  ``raw`` (w*h*3 sRGB bytes)
    and ``png`` (pure-stdlib zlib decoder, stages/png.py) are always
    available; JPEG/WebP/... route through PIL/cv2 when importable."""
    if codec == "raw":
        n = width * height * 3
        if len(payload) != n:
            raise ValueError(f"raw payload size {len(payload)} != {n}")
        return np.frombuffer(payload, np.uint8).reshape(height, width, 3)
    if codec in ("png", "ppm", "bmp", "gif", "jpg", "jpeg", "webp"):
        from .imageio import load_image_bytes
        img = load_image_bytes(bytes(payload))
        if img.shape[:2] != (height, width):
            raise ValueError(
                f"{codec} dims {img.shape[1]}x{img.shape[0]} != metadata "
                f"{width}x{height}")
        return img
    try:  # pragma: no cover - codecs absent in sandbox
        from PIL import Image
        import io
        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError:
        raise NotImplementedError(
            f"codec {codec!r} needs an image library (none in this sandbox); "
            "store media as raw sRGB bytes or PNG, or install PIL/cv2")


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy — deterministic thumbnailer)."""
    h, w = img.shape[0], img.shape[1]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[np.ix_(yi, xi)]


def image_features(img: np.ndarray) -> np.ndarray:
    """Cheap deterministic image descriptor: per-channel mean/std +
    8-bin luma histogram + edge energy → float32[16]."""
    f = img.astype(np.float32)
    luma = f @ np.array([0.299, 0.587, 0.114], np.float32)
    gx = np.abs(np.diff(luma, axis=1)).mean() if luma.shape[1] > 1 else 0.0
    gy = np.abs(np.diff(luma, axis=0)).mean() if luma.shape[0] > 1 else 0.0
    hist, _ = np.histogram(luma, bins=8, range=(0, 256))
    hist = hist / max(luma.size, 1)
    return np.concatenate([f.mean(axis=(0, 1)), f.std(axis=(0, 1)),
                           hist, [gx, gy]]).astype(np.float32)


def sample_frames(payload: bytes, codec: str, width: int, height: int,
                  n_frames: int, every: int = 1) -> list:
    """Frame sampler for video-shaped payloads: ``raw`` video =
    concatenated w*h*3 frames; returns every ``every``-th frame array."""
    if codec != "raw":
        raise NotImplementedError("video codecs unavailable in this sandbox")
    frame_bytes = width * height * 3
    total = len(payload) // frame_bytes
    frames = []
    for i in range(0, min(total, n_frames * every), every):
        frames.append(np.frombuffer(
            payload[i * frame_bytes:(i + 1) * frame_bytes], np.uint8
        ).reshape(height, width, 3))
    return frames


class MediaFeaturizer:
    """Actor stage: decode → (optional thumbnail) → feature vector.

    Input columns: media_ref, payload(binary), codec, width, height.
    Output: media_ref, features(list<float32>[16]),
    thumb(binary, thumb_px² sRGB), decode_error(string).
    """

    def __init__(self, thumb_px: int = 16):
        self.thumb_px = thumb_px

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        # zero-copy views into the Arrow binary buffers (the
        # stages/scorer.py idiom) — no per-payload bytes copies
        pay_col = batch["payload"].combine_chunks()
        payloads = [None if not v.is_valid else v.as_buffer()
                    for v in pay_col]
        codecs = batch["codec"].to_pylist()
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        feats, thumbs, errors = [], [], []
        for ref, pl, codec, w, h in zip(refs, payloads, codecs, widths, heights):
            try:
                img = decode_media(pl, codec, w, h)
                feats.append(image_features(img).tolist())
                thumbs.append(resize_nearest(img, self.thumb_px,
                                             self.thumb_px).tobytes())
                errors.append(None)
            except (ValueError, NotImplementedError) as exc:
                feats.append(None)
                thumbs.append(None)
                errors.append(f"{type(exc).__name__}: {exc}")
        return pa.table({
            "media_ref": batch["media_ref"],
            "features": pa.array(feats, pa.list_(pa.float32())),
            "thumb": pa.array(thumbs, pa.binary()),
            "decode_error": pa.array(errors, pa.string()),
        })


class PHasher:
    """Actor stage: perceptual 64-bit image hash (pHash shape — luma →
    32×32 nearest resize → orthonormal 2D DCT-II → top-left 8×8 minus
    DC → sign-vs-median bits).  Emits the exploded
    (id, simhash, chunk_key) fingerprint rows
    ``functions/dedup.fingerprint_candidate_pairs`` expects, so media
    near-dup rides the SAME pigeonhole machinery as text SimHash.
    The DCT basis builds once per actor (__init__), not per batch.

    Input columns: ``id_col``(int64), payload(binary), codec, width,
    height.  Undecodable payloads are dropped (they can't near-dup)."""

    def __init__(self, id_col: str = "media_id", n: int = 32,
                 keep: int = 8):
        self.id_col, self.n, self.keep = id_col, n, keep
        k = np.arange(n, dtype=np.float64)
        basis = np.sqrt(2.0 / n) * np.cos(
            np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
        basis[0] = np.sqrt(1.0 / n)
        self.basis = basis

    def phash(self, payload, codec: str, w: int, h: int) -> int:
        img = decode_media(payload, codec, w, h)
        luma = img.astype(np.float64) @ np.array(
            [0.299, 0.587, 0.114], np.float64)
        t = resize_nearest(luma, self.n, self.n)
        d = self.basis @ t @ self.basis.T
        block = d[:self.keep, :self.keep].ravel()[1:]  # drop DC
        med = float(np.median(block))
        bits = (block > med).astype(np.uint64)
        return int((bits << np.arange(len(bits),
                                      dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table):
        import pandas as pd
        pay_col = batch["payload"].combine_chunks()
        payloads = [None if not v.is_valid else v.as_buffer()
                    for v in pay_col]
        ids, hashes = [], []
        for mid, pl, codec, w, h in zip(batch[self.id_col].to_pylist(),
                                        payloads,
                                        batch["codec"].to_pylist(),
                                        batch["width"].to_pylist(),
                                        batch["height"].to_pylist()):
            try:
                hashes.append(self.phash(pl, codec, w, h))
                ids.append(mid)
            except (ValueError, NotImplementedError):
                continue
        sh = np.array(hashes, dtype=np.uint64)
        n = len(sh)
        chunk_id = np.repeat(np.arange(4, dtype=np.int64), n)
        chunk_val = np.concatenate([
            ((sh >> np.uint64(16 * c)) & np.uint64(0xFFFF))
            .astype(np.int64) for c in range(4)]) if n else \
            np.array([], dtype=np.int64)
        return pd.DataFrame({
            self.id_col: np.tile(np.array(ids, dtype=np.int64), 4),
            "simhash": np.tile(sh.astype(np.int64), 4),
            "chunk_key": (chunk_id << 16) | chunk_val})


class FrameSampler:
    """Actor stage for video-shaped payloads: sample frames, emit one
    feature row per sampled frame (flat_map shape: 1 row → k rows)."""

    def __init__(self, n_frames: int = 4, every: int = 2):
        self.n_frames = n_frames
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_ref": [], "frame_idx": [], "features": [],
               "decode_error": []}
        pay_col = batch["payload"].combine_chunks()
        payloads = [None if not v.is_valid else v.as_buffer()
                    for v in pay_col]
        for ref, pl, codec, w, h in zip(batch["media_ref"].to_pylist(),
                                        payloads,
                                        batch["codec"].to_pylist(),
                                        batch["width"].to_pylist(),
                                        batch["height"].to_pylist()):
            try:
                frames = sample_frames(pl, codec, w, h, self.n_frames, self.every)
                for i, fr in enumerate(frames):
                    out["media_ref"].append(ref)
                    out["frame_idx"].append(i * self.every)
                    out["features"].append(image_features(fr).tolist())
                    out["decode_error"].append(None)
            except (ValueError, NotImplementedError) as exc:
                out["media_ref"].append(ref)
                out["frame_idx"].append(-1)
                out["features"].append(None)
                out["decode_error"].append(f"{type(exc).__name__}: {exc}")
        return pa.table({
            "media_ref": pa.array(out["media_ref"], pa.string()),
            "frame_idx": pa.array(out["frame_idx"], pa.int32()),
            "features": pa.array(out["features"], pa.list_(pa.float32())),
            "decode_error": pa.array(out["decode_error"], pa.string()),
        })
