"""Codec decode throughput on a 512x512 photo-like fixture.

Round-5 evidence for the entropy-decode vectorization (VERDICT r4 next
item #1): prints one JSON line with decode wall time and Mpx/s for PNG
(mixed Paeth/Average rows via zlib-level-6 encode of a smooth gradient
+ noise image) and baseline JPEG (q=90).  Run before/after to verify
the >=10x target on the slow paths.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def photo_like(h: int = 512, w: int = 512, seed: int = 5) -> np.ndarray:
    """Smooth gradients + correlated noise: compresses like a photo and
    drives PNG encoders toward Paeth/Average row filters."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 90 * np.sin(yy / 37.0) * np.cos(xx / 53.0))[..., None]
    chroma = np.stack([np.sin(xx / 29.0), np.cos(yy / 41.0),
                       np.sin((xx + yy) / 61.0)], axis=-1) * 40
    noise = rng.normal(0, 6, (h, w, 3)).cumsum(axis=1) / np.sqrt(
        np.arange(1, w + 1))[None, :, None]
    return np.clip(base + chroma + noise, 0, 255).astype(np.uint8)


def time_fn(fn, *args, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from butteraugli_ray.stages.jpeg import decode_jpeg, encode_jpeg
    from butteraugli_ray.stages.png import decode_png, encode_png

    img = photo_like()
    mpx = img.shape[0] * img.shape[1] / 1e6
    out = {"fixture": "photo_like_512", "mpx": mpx}

    png = encode_png(img)
    # how many rows actually took the sequential filters?
    import zlib

    raw = zlib.decompress(png[8 + 8 + 13 + 12 + 8:-12]) \
        if False else None  # noqa: F841 (kept simple: count via decoder)
    t = time_fn(decode_png, png)
    out["png"] = {"bytes": len(png), "decode_s": round(t, 4),
                  "mpx_per_s": round(mpx / t, 2)}

    jpg = encode_jpeg(img, quality=90)
    t = time_fn(decode_jpeg, jpg)
    out["jpeg_q90"] = {"bytes": len(jpg), "decode_s": round(t, 4),
                       "mpx_per_s": round(mpx / t, 2)}

    try:
        from butteraugli_ray.stages.webp import decode_webp, \
            encode_webp_lossless
        wp = encode_webp_lossless(img)
        t = time_fn(decode_webp, wp)
        out["webp_lossless"] = {"bytes": len(wp), "decode_s": round(t, 4),
                                "mpx_per_s": round(mpx / t, 2)}
    except Exception as e:  # pragma: no cover
        out["webp_lossless"] = {"error": str(e)}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
