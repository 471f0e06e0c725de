"""Stateful streaming ingestion: micro-batch sessionization.

This is the one operator class where the Dataset API genuinely cannot
express the semantics: an UNBOUNDED ts-ordered event stream needs
cross-micro-batch mutable state (the open sessions), so raw Ray actors
hold it — the documented last-resort tier of the engine's operator
policy (SURVEY.md §2.12).  Design for scale:

- the open-session index shards across ``n_shards`` actors by a hash
  of user_id — each shard holds only its users, so state grows with
  ACTIVE users per shard, not the corpus;
- each micro-batch routes to shards with one vectorized pandas pass
  (sort + run-length session splits; the only Python loop is the
  per-DISTINCT-user state-dict update);
- per-user results merge associatively (counts), so finalize() is a
  tiny per-shard table — no shuffle anywhere;
- ordering contract: same-user events arrive in nondecreasing ts
  across micro-batches (a time-ordered stream guarantees this at the
  source; the simulation harness sorts first and documents the cost).

The closed-form batch query (pipelines/queries.q_user_sessions) and
this streaming engine share ONE DuckDB window-function oracle — two
independent execution strategies, one correctness contract.

Reference analog: stateful warm-reference reuse across a stream of
candidates (butteraugli/src/precompute.rs:1-26) — here the warm state
is the open-session table instead of pyramids.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray


def _user_shard(user_ids: np.ndarray, n_shards: int) -> np.ndarray:
    v = user_ids.astype(np.uint64)
    with np.errstate(over="ignore"):
        v = (v ^ (v >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        v = v ^ (v >> np.uint64(33))
    return (v % np.uint64(n_shards)).astype(np.int64)


@ray.remote
class SessionShard:
    """Holds open-session state for one hash shard of users."""

    def __init__(self, gap_minutes: float = 30.0):
        self.gap = np.timedelta64(int(gap_minutes * 60 * 1_000_000), "us")
        self.last_ts: dict[int, np.datetime64] = {}
        self.n_events: dict[int, int] = {}
        self.n_sessions: dict[int, int] = {}

    def ingest(self, df: pd.DataFrame) -> int:
        """One micro-batch slice (user_id, ts).  Vectorized: in-batch
        session splits come from run-length diffs; only run HEADS
        consult the cross-batch state."""
        if not len(df):
            return 0
        df = df.sort_values(["user_id", "ts"])
        u = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy(dtype="datetime64[us]")
        head = np.concatenate([[True], u[1:] != u[:-1]])
        # in-batch gaps (never at a run head)
        prev = np.concatenate([ts[:1], ts[:-1]])
        gap_in = (~head) & ((ts - prev) > self.gap)
        run_id = np.cumsum(head) - 1
        n_runs = int(run_id[-1]) + 1
        gaps_per_run = np.bincount(run_id, weights=gap_in).astype(np.int64)
        events_per_run = np.bincount(run_id).astype(np.int64)
        head_idx = np.flatnonzero(head)
        tail_idx = np.concatenate([head_idx[1:] - 1, [len(u) - 1]])
        users = u[head_idx]
        first_ts = ts[head_idx]
        last_ts = ts[tail_idx]
        # per-distinct-user state update (bounded by active users/batch)
        for i in range(n_runs):
            uid = int(users[i])
            prior = self.last_ts.get(uid)
            if prior is None:
                self.n_sessions[uid] = 1 + int(gaps_per_run[i])
                self.n_events[uid] = int(events_per_run[i])
            else:
                if (first_ts[i] - prior) > self.gap:
                    self.n_sessions[uid] += 1
                self.n_sessions[uid] += int(gaps_per_run[i])
                self.n_events[uid] += int(events_per_run[i])
            self.last_ts[uid] = last_ts[i]
        return n_runs

    def finalize(self) -> pd.DataFrame:
        users = sorted(self.n_events)
        return pd.DataFrame({
            "user_id": np.array(users, dtype=np.int64),
            "n_events": np.array([self.n_events[u] for u in users],
                                 dtype=np.int64),
            "n_sessions": np.array([self.n_sessions[u] for u in users],
                                   dtype=np.int64)})


def sessionize_stream(micro_batches, gap_minutes: float = 30.0,
                      n_shards: int = 8,
                      max_inflight: int | None = None) -> pd.DataFrame:
    """Feed time-ordered micro-batches (pandas frames with user_id, ts)
    through sharded session actors → per-user (n_events, n_sessions).

    ``max_inflight`` bounds outstanding ingests for backpressure
    (default 4×n_shards): the driver never holds more than that many
    routed slices in flight, so an unbounded stream runs in bounded
    memory."""
    if max_inflight is None:
        max_inflight = 4 * n_shards
    shards = [SessionShard.remote(gap_minutes) for _ in range(n_shards)]
    pending: list = []
    for mb in micro_batches:
        if not len(mb):
            continue
        sid = _user_shard(mb["user_id"].to_numpy(dtype=np.int64), n_shards)
        for i in np.unique(sid):
            sub = mb[sid == i][["user_id", "ts"]]
            pending.append(shards[int(i)].ingest.remote(sub))
        while len(pending) > max_inflight:
            _, pending = ray.wait(pending, num_returns=1)
    ray.get(pending)
    parts = ray.get([s.finalize.remote() for s in shards])
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values("user_id").reset_index(drop=True)


def stream_dataset_by_time(ds, batch_rows: int = 4096):
    """Simulation harness: a ts-ordered micro-batch iterator from a
    Dataset.  The global ts sort exists ONLY to simulate an ordered
    stream from batch data — a real deployment consumes an already
    time-ordered log and skips this."""
    for b in (ds.sort("ts")
              .iter_batches(batch_format="pandas", batch_size=batch_rows)):
        yield b


@ray.remote
class WindowShard:
    """Event-time tumbling windows with a WATERMARK for one key shard.

    State is bounded by OPEN windows per shard, not stream length: the
    watermark = max event ts seen − allowed lateness; when it passes a
    window's end the window finalizes into the emitted buffer and its
    state is freed.  Events older than an already-closed window are
    counted as late-drops (closed windows are immutable — the
    standard watermark contract)."""

    def __init__(self, width_minutes: float = 30.0,
                 lateness_minutes: float = 10.0):
        self.w = np.int64(width_minutes * 60 * 1_000_000)
        self.late = np.int64(lateness_minutes * 60 * 1_000_000)
        self.open: dict = {}            # (key, w_start) -> [n, sum]
        self.emitted: list = []
        self.watermark = np.int64(-(1 << 62))
        self.n_late = 0

    def _close_ripe(self) -> None:
        ripe = [kw for kw in self.open if kw[1] + self.w <= self.watermark]
        for kw in ripe:
            n, s = self.open.pop(kw)
            self.emitted.append((kw[0], int(kw[1]), int(n), float(s)))

    def ingest(self, df: pd.DataFrame) -> int:
        if not len(df):
            return 0
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        ws = (ts // self.w) * self.w
        g = (pd.DataFrame({"key": df["key"].to_numpy(), "ws": ws,
                           "v": df["value"].to_numpy(dtype=np.float64)})
             .groupby(["key", "ws"], as_index=False)
             .agg(n=("v", "size"), s=("v", "sum")))
        for key, w0, n, sv in zip(g["key"], g["ws"], g["n"], g["s"]):
            kw = (key, np.int64(w0))
            if kw[1] + self.w <= self.watermark:
                self.n_late += int(n)        # window already closed
                continue
            st = self.open.get(kw)
            if st is None:
                self.open[kw] = [int(n), float(sv)]
            else:
                st[0] += int(n)
                st[1] += float(sv)
        self.watermark = max(self.watermark,
                             np.int64(ts.max()) - self.late)
        self._close_ripe()
        return len(self.open)

    def finalize(self) -> tuple:
        self.watermark = np.int64(1 << 62)
        self._close_ripe()
        out = pd.DataFrame(self.emitted,
                           columns=["key", "w_start", "n_events",
                                    "sum_value"])
        return out, self.n_late


def windowed_stream(micro_batches, width_minutes: float = 30.0,
                    lateness_minutes: float = 10.0, n_shards: int = 4,
                    max_inflight: int | None = None):
    """Feed micro-batches (pandas frames with key, ts, value) through
    sharded watermark window actors → ((key, w_start, n_events,
    sum_value) table, total late-dropped events).  Same backpressure
    contract as sessionize_stream."""
    if max_inflight is None:
        max_inflight = 4 * n_shards
    shards = [WindowShard.remote(width_minutes, lateness_minutes)
              for _ in range(n_shards)]
    pending: list = []
    for mb in micro_batches:
        if not len(mb):
            continue
        import pandas as _pd
        sid = (_pd.util.hash_pandas_object(mb["key"], index=False)
               .to_numpy() % n_shards).astype(np.int64)
        for i in np.unique(sid):
            sub = mb[sid == i][["key", "ts", "value"]]
            pending.append(shards[int(i)].ingest.remote(sub))
        while len(pending) > max_inflight:
            _, pending = ray.wait(pending, num_returns=1)
    ray.get(pending)
    parts = ray.get([s.finalize.remote() for s in shards])
    out = pd.concat([p for p, _ in parts], ignore_index=True)
    n_late = sum(n for _, n in parts)
    return out.sort_values(["key", "w_start"]).reset_index(drop=True), n_late
