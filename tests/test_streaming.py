"""Streaming sessionizer equals the batch window computation."""

import numpy as np
import pandas as pd


def _batch_truth(df: pd.DataFrame, gap_min: float = 30.0) -> pd.DataFrame:
    rows = []
    for uid, g in df.groupby("user_id"):
        ts = g["ts"].sort_values().reset_index(drop=True)
        n_sessions = int((ts.diff() > pd.Timedelta(minutes=gap_min)).sum()) + 1
        rows.append((uid, len(g), n_sessions))
    return (pd.DataFrame(rows, columns=["user_id", "n_events", "n_sessions"])
            .astype(np.int64).sort_values("user_id").reset_index(drop=True))


def _synth_events(seed: int, n: int, n_users: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    base = np.datetime64("2026-01-01T00:00:00", "us")
    # bursty: mostly small gaps, occasional multi-hour jumps
    gaps = np.where(rng.random(n) < 0.07,
                    rng.integers(31 * 60, 6 * 3600, n),
                    rng.integers(1, 20 * 60, n)).astype("timedelta64[s]")
    return pd.DataFrame({
        "user_id": rng.integers(0, n_users, n).astype(np.int64),
        "ts": base + np.cumsum(gaps).astype("timedelta64[us]")})


def test_streaming_sessions_match_batch(ray_session):
    from butteraugli_ray.state.streaming import sessionize_stream
    df = _synth_events(2, 5000, 60)
    df = df.sort_values("ts").reset_index(drop=True)
    # tiny micro-batches force many cross-batch session continuations,
    # and max_inflight=4 exercises the backpressure wait loop
    micro = [df.iloc[i:i + 257] for i in range(0, len(df), 257)]
    got = sessionize_stream(micro, n_shards=4, max_inflight=4)
    pd.testing.assert_frame_equal(got, _batch_truth(df))


def test_streaming_sessions_gap_at_batch_boundary(ray_session):
    from butteraugli_ray.state.streaming import sessionize_stream
    base = np.datetime64("2026-01-01T00:00:00", "us")
    m = np.timedelta64(60 * 1_000_000, "us")          # one minute
    # user 1: session split lands exactly at a micro-batch boundary;
    # user 2: same-ts continuation across the boundary
    b1 = pd.DataFrame({"user_id": np.int64([1, 1, 2]),
                       "ts": [base, base + 5 * m, base + 5 * m]})
    b2 = pd.DataFrame({"user_id": np.int64([1, 2]),
                       "ts": [base + 40 * m, base + 5 * m]})
    got = sessionize_stream([b1, b2], n_shards=2)
    exp = pd.DataFrame({"user_id": np.int64([1, 2]),
                        "n_events": np.int64([3, 2]),
                        "n_sessions": np.int64([2, 1])})
    pd.testing.assert_frame_equal(got, exp)
