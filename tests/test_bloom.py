"""Bloom-filter membership: filter invariants and exact semi/anti joins."""

import numpy as np
import pandas as pd
import pytest


def test_bloom_no_false_negatives_and_fpr():
    from butteraugli_ray.functions.bloom import BloomFilter
    rng = np.random.default_rng(3)
    members = rng.choice(1 << 40, 5000, replace=False).astype(np.int64)
    b = BloomFilter.sized(len(members), fpr=0.01)
    b.add(members)
    assert b.contains(members).all()                  # never false-negative
    probe = rng.choice(1 << 40, 20000, replace=False).astype(np.int64)
    probe = np.setdiff1d(probe, members)
    fpr = b.contains(probe).mean()
    assert fpr < 0.03                                 # ~1% target, slack 3×


def test_bloom_string_keys_and_merge():
    from butteraugli_ray.functions.bloom import BloomFilter
    a = BloomFilter(4096, 5)
    c = BloomFilter(4096, 5)
    a.add(np.array(["alpha", "beta"], dtype=object))
    c.add(np.array(["gamma"], dtype=object))
    a.merge(c)
    got = a.contains(np.array(["alpha", "beta", "gamma"], dtype=object))
    assert got.all()
    with pytest.raises(ValueError):
        a.merge(BloomFilter(8192, 5))


def test_bloom_semi_and_anti_join_exact(ray_session):
    import ray.data as rd
    from butteraugli_ray.functions.bloom import (bloom_semi_join,
                                                 bloom_anti_join)
    rng = np.random.default_rng(5)
    big = pd.DataFrame({
        "k": rng.integers(0, 400, 3000).astype(np.int64),
        "v": np.arange(3000, dtype=np.int64)})
    small = pd.DataFrame({"k": np.arange(0, 400, 3, dtype=np.int64)})
    member = big["k"].isin(set(small["k"]))

    semi = (bloom_semi_join(rd.from_pandas(big), rd.from_pandas(small),
                            "k", fpr=0.05)
            .to_pandas().sort_values("v").reset_index(drop=True))
    exp = big[member].sort_values("v").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        semi[["k", "v"]].astype(np.int64), exp[["k", "v"]])

    anti = (bloom_anti_join(rd.from_pandas(big), rd.from_pandas(small),
                            "k", fpr=0.05)
            .to_pandas().sort_values("v").reset_index(drop=True))
    exp = big[~member].sort_values("v").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        anti[["k", "v"]].astype(np.int64), exp[["k", "v"]])


def test_bloom_anti_join_string_key_mixed_cols(ray_session):
    """String join key plus extra string/float columns survive the
    tagged-union sentinel padding with types intact."""
    import ray.data as rd
    from butteraugli_ray.functions.bloom import bloom_anti_join
    big = pd.DataFrame({
        "fp": [f"h{i % 7}" for i in range(50)],
        "name": [f"doc{i}" for i in range(50)],
        "w": np.linspace(0, 1, 50)})
    small = pd.DataFrame({"fp": ["h0", "h3"]})
    out = (bloom_anti_join(rd.from_pandas(big), rd.from_pandas(small), "fp")
           .to_pandas().sort_values("name").reset_index(drop=True))
    exp = (big[~big["fp"].isin({"h0", "h3"})]
           .sort_values("name").reset_index(drop=True))
    pd.testing.assert_frame_equal(out[["fp", "name", "w"]],
                                  exp[["fp", "name", "w"]])
