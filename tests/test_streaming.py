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


def test_windowed_stream_watermark_late_drop(ray_session):
    """Out-of-order stream: an event older than watermark − lateness
    lands in an already-CLOSED window → counted late and dropped;
    in-lateness disorder is absorbed exactly."""
    from butteraugli_ray.state.streaming import windowed_stream
    t0 = pd.Timestamp("2025-01-01 00:00:00")
    mk = lambda mins, v: {"key": "a", "ts": t0 + pd.Timedelta(minutes=mins),
                          "value": float(v)}
    # window width 30 min, lateness 10 min
    mb1 = pd.DataFrame([mk(5, 1), mk(25, 2)])          # window [0, 30)
    mb2 = pd.DataFrame([mk(70, 4)])                    # watermark → 60
    # 12' and 55' both land in windows closed by watermark 60 → late;
    # 65' is within lateness of the open [60, 90) window → absorbed
    mb3 = pd.DataFrame([mk(12, 8), mk(55, 16), mk(65, 32)])
    out, n_late = windowed_stream(iter([mb1, mb2, mb3]),
                                  width_minutes=30, lateness_minutes=10,
                                  n_shards=2)
    assert n_late == 2
    e0 = int(t0.value // 1000)                  # epoch µs of t0
    got = {int((w - e0) // 60_000_000): (int(n), float(s))
           for w, n, s in zip(out["w_start"], out["n_events"],
                              out["sum_value"])}
    assert got[0] == (2, 3.0)       # [0,30): the late 8 NOT included
    assert 30 not in got            # [30,60): only arrival was late
    assert got[60] == (2, 36.0)     # [60,90): 70' + in-lateness 65'


def test_windowed_stream_matches_batch_when_ordered(ray_session):
    """Ordered stream ⇒ zero late drops and exact agreement with the
    closed-form pandas tumbling window."""
    from butteraugli_ray.state.streaming import windowed_stream
    rng = np.random.default_rng(9)
    n = 5000
    ts = (pd.Timestamp("2025-02-01")
          + pd.to_timedelta(np.sort(rng.integers(0, 7 * 24 * 3600, n)),
                            unit="s"))
    df = pd.DataFrame({"key": rng.choice(["x", "y", "z"], n),
                       "ts": ts, "value": rng.normal(size=n)})
    mbs = [df.iloc[i:i + 512] for i in range(0, n, 512)]
    out, n_late = windowed_stream(iter(mbs), width_minutes=30,
                                  lateness_minutes=10, n_shards=3)
    assert n_late == 0
    w = np.int64(30 * 60 * 1_000_000)
    ref = df.copy()
    ref["w_start"] = (ref["ts"].astype("datetime64[us]").astype("int64")
                      // w) * w
    ref = (ref.groupby(["key", "w_start"], as_index=False)
           .agg(n_events=("value", "size"), sum_value=("value", "sum"))
           .sort_values(["key", "w_start"]).reset_index(drop=True))
    assert out["key"].tolist() == ref["key"].tolist()
    assert out["n_events"].tolist() == ref["n_events"].tolist()
    np.testing.assert_allclose(out["sum_value"].to_numpy(),
                               ref["sum_value"].to_numpy(), rtol=1e-12)
