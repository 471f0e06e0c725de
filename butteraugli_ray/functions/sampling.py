"""Deterministic sampling / mixture weighting over a Ray Dataset.

Training-data pipelines rebalance corpora by sampling each stratum
(language, source, quality band) at its own rate.  The sample must be
DETERMINISTIC — stable under re-runs, repartitioning, block order and
incremental ingestion — so membership is decided by a salted content
hash per row, never by an RNG: row r is kept at rate p iff
``md5(salt:key(r))`` (first 16 bits) < p · 2¹⁶.  Expected rate error is
≤ 2⁻¹⁶ per stratum.

Scale shape: the hash is per-row but bounded work (same contract as
fingerprint_md5); the filter runs inside ``map_batches`` so the sample
streams — nothing materializes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_HASH_SPACE = 1 << 16


def hash_frac(keys: pd.Series, salt: str = "") -> np.ndarray:
    """Deterministic uniform [0, 1) fraction per key: first 16 bits of
    ``md5(salt + ':' + str(key))`` over 2¹⁶.  Matches the DuckDB oracle
    expression ``('0x' || substr(md5(salt || ':' || CAST(key AS
    VARCHAR)), 1, 4))::BIGINT / 65536.0``."""
    pre = f"{salt}:".encode()
    vals = np.fromiter(
        (int(hashlib.md5(pre + str(k).encode()).hexdigest()[:4], 16)
         for k in keys.to_numpy()),
        dtype=np.int64, count=len(keys))
    return vals / float(_HASH_SPACE)


def weighted_sample_mask(df: pd.DataFrame, key_col: str, stratum_col: str,
                         rates: dict[str, float], salt: str = "mix",
                         default_rate: float = 0.0) -> np.ndarray:
    """Boolean keep-mask: row kept iff its stratum's rate exceeds the
    row's deterministic hash fraction."""
    frac = hash_frac(df[key_col], salt=salt)
    rate = df[stratum_col].map(rates).fillna(default_rate).to_numpy(
        dtype=np.float64)
    return frac < rate


def weighted_sample(ds, key_col: str, stratum_col: str,
                    rates: dict[str, float], salt: str = "mix",
                    default_rate: float = 0.0):
    """Streaming deterministic mixture sample of a Ray Dataset."""
    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[weighted_sample_mask(df, key_col, stratum_col, rates,
                                       salt, default_rate)]
    return ds.map_batches(keep, batch_format="pandas")


_ES_MOD = 1 << 32


def es_sample_key(keys: pd.Series, weights: np.ndarray,
                  nd: int = 9) -> np.ndarray:
    """Efraimidis–Spirakis weighted-sampling key: ln(u)/w with the
    deterministic uniform u = (md5_number_lower(str(key)) % 2³² + 1) /
    (2³² + 1); the global top-k by this key (desc) is a weighted sample
    WITHOUT replacement with inclusion ∝ w.  Bit-matches the DuckDB
    expression ``ln((md5_number_lower(CAST(key AS VARCHAR)) % 4294967296
    + 1) / 4294967297.0) / w`` up to libm last-ulp ln noise, which the
    ROUND to ``nd`` decimals absorbs (ties then break on the row key
    identically on both sides)."""
    h = np.fromiter(
        (int.from_bytes(hashlib.md5(str(k).encode()).digest()[8:16],
                        "little") % _ES_MOD
         for k in keys.to_numpy()), dtype=np.int64, count=len(keys))
    u = (h + 1) / float(_ES_MOD + 1)
    key = np.log(u) / np.asarray(weights, dtype=np.float64)
    m = 10.0 ** nd
    return np.sign(key) * np.floor(np.abs(key) * m + 0.5) / m
