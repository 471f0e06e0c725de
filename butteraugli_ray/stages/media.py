"""Multimodal media stages: decode / resize / feature-extract /
frame-sample as actor-pool ``map_batches`` stages.

The corpus treats image/audio/video payloads as opaque ``binary``
columns with typed metadata (media_ref, kind, width/height/duration).
This sandbox ships no image/audio codecs, so the CODEC step is stubbed:
``codec="raw"`` (w*h*3 sRGB bytes, the corpus native format) is fully
implemented; compressed codecs raise ``NotImplementedError`` behind an
import-try so the Ray-side plumbing — schema, batch sizing, actor
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
    """binary payload → uint8 [h, w, 3].  Only ``raw`` is available in
    this sandbox; PNG/JPEG route through PIL/cv2 when importable."""
    if codec == "raw":
        n = width * height * 3
        if len(payload) != n:
            raise ValueError(f"raw payload size {len(payload)} != {n}")
        return np.frombuffer(payload, np.uint8).reshape(height, width, 3)
    try:  # pragma: no cover - codecs absent in sandbox
        from PIL import Image
        import io
        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError:
        raise NotImplementedError(
            f"codec {codec!r} needs an image library (none in this sandbox); "
            "store media as raw sRGB bytes or install PIL/cv2")


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
