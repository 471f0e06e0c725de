"""Strip-mode parity, multimodal media stages, CLI contract, connected
components."""

import json
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pytest

from butteraugli_ray.corpus.generators import (distort_noise,
                                               gen_random_midrange)
from butteraugli_ray.metric.api import ButteraugliParams, butteraugli_srgb
from butteraugli_ray.metric.strip import butteraugli_strip


class TestStrip:
    def test_strip_matches_full(self):
        # README.md:277-285: interior rows bit-identical; score ≤ ~1e-2 off
        for (w, h, sh) in ((64, 256, 64), (96, 300, 128), (64, 97, 16)):
            a = gen_random_midrange(w, h, 5)
            b = distort_noise(a, 6, 12)
            full = butteraugli_srgb(a, b)
            strip = butteraugli_strip(a, b, strip_height=sh)
            assert abs(full.score - strip.score) <= 1e-2 * max(full.score, 1.0)
            assert abs(full.pnorm_3 - strip.pnorm_3) <= 1e-2

    def test_strip_diffmap_interior_identical(self):
        p = ButteraugliParams(compute_diffmap=True)
        a = gen_random_midrange(64, 300, 5)
        b = distort_noise(a, 6, 12)
        f = butteraugli_srgb(a, b, p)
        s = butteraugli_strip(a, b, 128, params=p)
        assert np.isclose(f.diffmap, s.diffmap, rtol=1e-4).all()

    def test_strip_rejects_small(self):
        a = gen_random_midrange(4, 4, 1)
        with pytest.raises(ValueError):
            butteraugli_strip(a, a.copy())
        a = gen_random_midrange(32, 32, 1)
        with pytest.raises(ValueError):
            butteraugli_strip(a, a.copy(), strip_height=2)

    def test_strip_identical_zero(self):
        a = gen_random_midrange(32, 64, 1)
        r = butteraugli_strip(a, a.copy())
        assert r.score == 0.0


class TestMediaStages:
    def _batch(self, n=4, px=16, corrupt_idx=None, codec="raw"):
        rows = {"media_ref": [], "payload": [], "codec": [],
                "width": [], "height": []}
        for i in range(n):
            img = gen_random_midrange(px, px, 100 + i)
            payload = img.tobytes()
            if corrupt_idx == i:
                payload = payload[:-5]
            rows["media_ref"].append(f"m{i}")
            rows["payload"].append(payload)
            rows["codec"].append(codec)
            rows["width"].append(px)
            rows["height"].append(px)
        return pa.table(rows)

    def test_featurizer(self):
        from butteraugli_ray.stages.media import MediaFeaturizer
        out = MediaFeaturizer(thumb_px=8)(self._batch())
        assert out.num_rows == 4
        feats = out["features"].to_pylist()
        assert all(len(f) == 16 for f in feats)
        assert all(len(t) == 8 * 8 * 3 for t in out["thumb"].to_pylist())
        assert all(e is None for e in out["decode_error"].to_pylist())

    def test_featurizer_corrupt_payload_becomes_error_row(self):
        from butteraugli_ray.stages.media import MediaFeaturizer
        out = MediaFeaturizer()(self._batch(corrupt_idx=1))
        errs = out["decode_error"].to_pylist()
        assert errs[1] is not None and "ValueError" in errs[1]
        assert errs[0] is None

    def test_unknown_codec_stubbed(self):
        # lossy WebP (VP8) is the one reference-CLI input still behind
        # the import-try stub (png/jpeg/gif/bmp/lossless-webp decode
        # natively) — a VP8 chunk must surface NotImplementedError
        import struct
        from butteraugli_ray.stages.media import decode_media
        lossy = (b"RIFF" + struct.pack("<I", 16) + b"WEBP"
                 + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4)
        try:
            decode_media(lossy, "webp", 4, 4)
            raise AssertionError("lossy webp should not decode")
        except NotImplementedError:
            pass

    def test_frame_sampler(self):
        from butteraugli_ray.stages.media import FrameSampler
        px = 8
        frames = [gen_random_midrange(px, px, i) for i in range(6)]
        payload = b"".join(f.tobytes() for f in frames)
        batch = pa.table({"media_ref": ["v0"], "payload": [payload],
                          "codec": ["raw"], "width": [px], "height": [px]})
        out = FrameSampler(n_frames=3, every=2)(batch)
        assert out["frame_idx"].to_pylist() == [0, 2, 4]

    def test_featurizer_through_ray(self, ray_session):
        import ray.data as rd
        from butteraugli_ray.stages.media import MediaFeaturizer
        ds = rd.from_arrow(self._batch(n=8))
        out = ds.map_batches(MediaFeaturizer, batch_format="pyarrow",
                             batch_size=4, concurrency=2).to_pandas()
        assert len(out) == 8 and out["decode_error"].isna().all()


class TestConnectedComponents:
    def test_components(self, ray_session):
        import pandas as pd
        import ray.data as rd
        from butteraugli_ray.functions.dedup import connected_components
        # two components: {1,2,3,4} (chain) and {10,11}
        pairs = pd.DataFrame({"id_a": [1, 2, 3, 10], "id_b": [2, 3, 4, 11]})
        out = connected_components(rd.from_pandas(pairs), max_iters=5).to_pandas()
        labels = dict(zip(out["node"], out["label"]))
        assert labels[1] == labels[2] == labels[3] == labels[4] == 1
        assert labels[10] == labels[11] == 10


class TestCli:
    def test_compare_exit_codes(self, tmp_path):
        from butteraugli_ray.corpus.synth import build_media_table
        import pyarrow.parquet as pq
        media_path = str(tmp_path / "media.parquet")
        pq.write_table(build_media_table(), media_path)
        base = [sys.executable, "-m", "butteraugli_ray.cli", "compare",
                "--media", media_path]
        r = subprocess.run(base + ["--media-ref", "img-radial_shift_2_32x32",
                                   "--max-score", "4.0"],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        out = json.loads(r.stdout)
        assert out["rating"] in ("excellent", "very good", "good", "fair")
        r = subprocess.run(base + ["--media-ref", "img-edge_v_vs_blur_32x32",
                                   "--max-score", "4.0"],
                           capture_output=True, text=True)
        assert r.returncode == 1
        r = subprocess.run(base + ["--media-ref", "nope"],
                           capture_output=True, text=True)
        assert r.returncode == 2

    def test_heatmap_ppm(self, tmp_path):
        from butteraugli_ray.cli import write_heatmap_ppm
        dm = np.random.default_rng(0).random((8, 10)).astype(np.float32)
        path = str(tmp_path / "x.ppm")
        write_heatmap_ppm(dm, path)
        data = open(path, "rb").read()
        assert data.startswith(b"P6\n10 8\n255\n")
        assert len(data) == len(b"P6\n10 8\n255\n") + 8 * 10 * 3


class TestWarmStrip:
    """Warm-reference strip compares (strip.rs:583-905) + cooperative
    mid-compare cancellation (diff.rs:761-763)."""

    def test_warm_strip_matches_full_large(self):
        from butteraugli_ray.metric.precompute import ReferencePrecompute
        a = gen_random_midrange(96, 1024, 5)
        b = distort_noise(a, 6, 12)
        full = butteraugli_srgb(a, b)
        pre = ReferencePrecompute(a, strip_only=True)
        r = pre.compare_strip(b, strip_height=256)
        assert abs(r.score - full.score) <= 1e-2 * max(full.score, 1.0)
        assert abs(r.pnorm_3 - full.pnorm_3) <= 1e-2

    def test_strip_cache_matches_uncached(self):
        """compare_strip(cache_reference=True) — the per-strip warm
        reference cache (VERDICT r2 #8) — must agree with the uncached
        strip walk (same slab math; float-order noise bound 1e-6), and
        the cache must be accounted in memory_bytes."""
        from butteraugli_ray.metric.precompute import ReferencePrecompute
        a = gen_random_midrange(96, 700, 5)
        b = distort_noise(a, 6, 12)
        pre = ReferencePrecompute(a, strip_only=True)
        cold = pre.compare_strip(b, strip_height=256)
        m0 = pre.memory_bytes()
        nbytes = pre.prepare_strip_cache(256)
        assert nbytes > 0
        assert pre.memory_bytes() == m0 + nbytes
        warm = pre.compare_strip(b, strip_height=256, cache_reference=True)
        assert warm.score == pytest.approx(cold.score, rel=1e-6)
        assert warm.pnorm_3 == pytest.approx(cold.pnorm_3, rel=1e-6)
        # a different strip geometry rebuilds (and still agrees)
        cold2 = pre.compare_strip(b, strip_height=128)
        warm2 = pre.compare_strip(b, strip_height=128, cache_reference=True)
        assert pre._strip_cache[0] == (128, 64)
        assert warm2.score == pytest.approx(cold2.score, rel=1e-6)

    def test_strip_only_memory_below_full(self):
        from butteraugli_ray.metric.precompute import ReferencePrecompute
        a = gen_random_midrange(256, 512, 5)
        slim = ReferencePrecompute(a, strip_only=True)
        fat = ReferencePrecompute(a)
        assert slim.memory_bytes() < fat.memory_bytes() / 3
        with pytest.raises(ValueError, match="strip_only"):
            slim.compare_srgb(distort_noise(a, 1, 5))
        # but the strip path works and the warm linear planes are reused
        assert slim.compare_strip(distort_noise(a, 1, 5)).score > 0

    def test_media_scorer_strip_path_parity(self):
        import pyarrow as pa
        from butteraugli_ray.stages.scorer import MediaScorer
        a = gen_random_midrange(64, 600, 5)
        b = distort_noise(a, 6, 12)
        batch = pa.table({
            "media_ref": pa.array(["m0"]),
            "width": pa.array([64]), "height": pa.array([600]),
            "ref_rgb": pa.array([a.tobytes()], pa.binary()),
            "dist_rgb": pa.array([b.tobytes()], pa.binary()),
        })
        full = MediaScorer()(batch)["score"][0].as_py()
        stripped = MediaScorer(strip_threshold_px=10_000)(batch)["score"][0].as_py()
        assert abs(full - stripped) <= 1e-2 * max(full, 1.0)

    def test_mid_compare_cancellation(self):
        from butteraugli_ray.metric.kernels import ButteraugliCancelled
        a = gen_random_midrange(64, 64, 5)
        b = distort_noise(a, 6, 12)
        with pytest.raises(ButteraugliCancelled):
            butteraugli_srgb(a, b, stop_check=lambda: True)
        # cancel between scales: allow the full-res pass, stop at half-res
        calls = {"n": 0}
        def stop_after_first():
            calls["n"] += 1
            return calls["n"] > 1
        with pytest.raises(ButteraugliCancelled):
            butteraugli_srgb(a, b, stop_check=stop_after_first)
        assert calls["n"] == 2

    def test_warm_compare_cancellation(self):
        from butteraugli_ray.metric.kernels import ButteraugliCancelled
        from butteraugli_ray.metric.precompute import ReferencePrecompute
        a = gen_random_midrange(64, 64, 5)
        pre = ReferencePrecompute(a)
        with pytest.raises(ButteraugliCancelled):
            pre.compare_srgb(distort_noise(a, 1, 5), stop_check=lambda: True)

    def test_strip_cancel_is_butteraugli_cancelled(self):
        from butteraugli_ray.metric.kernels import ButteraugliCancelled
        from butteraugli_ray.metric.strip import StripCancelled
        assert issubclass(StripCancelled, ButteraugliCancelled)


class TestQuerySubcommand:
    def test_list_and_run(self, ray_session, capsys, tmp_path):
        from butteraugli_ray.cli import main
        assert main(["query", "--list"]) == 0
        names = capsys.readouterr().out.split()
        assert "mktsegment_stats" in names and len(names) >= 40

        out = tmp_path / "res.parquet"
        assert main(["query", "mktsegment_stats",
                     "--sf-dir", "/root/testdata/sf0.001",
                     "--out", str(out)]) == 0
        import pyarrow.parquet as pq
        t = pq.read_table(out)
        assert t.num_rows == 5 and "c_mktsegment" in t.schema.names

    def test_unknown_query_errors(self, ray_session):
        from butteraugli_ray.cli import main
        assert main(["query", "not_a_query"]) == 2
