"""Text-analysis operators for large-scale training-data pipelines.

All are vectorized ``map_batches`` bodies (pandas str / numpy); regexes
compile once at module import (per worker process), never per batch.

- token counting: whitespace tokens + a BPE-ish word/punct split
- language ID: stopword + script heuristic (en/de/fr/es/zh)
- quality scoring: length / punctuation / stopword / alpha ratios
- fingerprinting: md5 content hash (SQL-parity) + 64-bit rolling hash
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

WS_TOKEN_RE = re.compile(r"\S+")
# BPE-ish pre-tokenizer: words, numbers, or single non-space symbols
BPE_TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
PUNCT_RE = re.compile(r"[^\w\s]")
ALPHA_RE = re.compile(r"[A-Za-z]")
CJK_RE = re.compile(r"[一-鿿぀-ヿ]")

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "was"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "du", "que"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "que"},
}


def token_count_whitespace(texts: pd.Series) -> np.ndarray:
    """Non-empty whitespace-separated token count (matches DuckDB
    ``len(regexp_extract_all(text, '\\S+'))``)."""
    return texts.fillna("").str.count(WS_TOKEN_RE).to_numpy(dtype=np.int64)


def token_count_bpe(texts: pd.Series) -> np.ndarray:
    """BPE-ish pre-tokenization count."""
    return texts.fillna("").str.count(BPE_TOKEN_RE).to_numpy(dtype=np.int64)


_STOPWORD_PATTERNS = {
    lang: [re.compile(rf"(?<!\S){re.escape(w)}(?!\S)") for w in sorted(sw)]
    for lang, sw in _STOPWORDS.items()
}


def detect_language(texts: pd.Series) -> pd.Series:
    """Stopword/script heuristic language ID → {en,de,fr,es,zh,unknown}.

    Vectorized: one ``str.contains`` C-pass per stopword (40 total) over
    the lowercased series builds a presence matrix; argmax over the
    language order resolves ties first-language-wins, exactly like the
    per-row set-intersection loop this replaces (which capped matching
    at the first 200 tokens; the vectorized scan reads the whole text —
    strictly more evidence, same prediction on bounded docs)."""
    t = texts.fillna("").str.lower()
    langs = list(_STOPWORD_PATTERNS)
    counts = np.zeros((len(langs), len(t)), dtype=np.int64)
    for li, lang in enumerate(langs):
        for pat in _STOPWORD_PATTERNS[lang]:
            counts[li] += t.str.contains(pat).to_numpy()
    best = np.argmax(counts, axis=0)             # first max wins (lang order)
    best_n = counts[best, np.arange(len(t))]
    out = np.array(langs, dtype=object)[best]
    out[best_n == 0] = "unknown"
    out[t.str.contains(CJK_RE).to_numpy()] = "zh"
    return pd.Series(out, index=texts.index, dtype="object")


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Vectorized quality features per document."""
    t = texts.fillna("")
    n_chars = t.str.len().to_numpy(dtype=np.int64)
    n_tokens = t.str.count(WS_TOKEN_RE).to_numpy(dtype=np.int64)
    n_punct = t.str.count(PUNCT_RE).to_numpy(dtype=np.int64)
    n_alpha = t.str.count(ALPHA_RE).to_numpy(dtype=np.int64)
    safe_chars = np.maximum(n_chars, 1)
    safe_tokens = np.maximum(n_tokens, 1)
    mean_word_len = (n_chars - (n_tokens - 1).clip(min=0)) / safe_tokens
    feats = pd.DataFrame({
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": n_punct / safe_chars,
        "alpha_ratio": n_alpha / safe_chars,
        "mean_word_len": mean_word_len,
    }, index=texts.index)
    # crude composite quality in [0,1]: long enough, mostly alphabetic,
    # not punctuation-soup, sane word lengths
    q = (np.clip(n_tokens / 20.0, 0, 1) * 0.4
         + feats["alpha_ratio"].to_numpy() * 0.3
         + (1.0 - np.clip(feats["punct_ratio"].to_numpy() * 4.0, 0, 1)) * 0.2
         + np.clip(1.0 - np.abs(mean_word_len - 5.0) / 10.0, 0, 1) * 0.1)
    feats["quality"] = q
    return feats


# explicit ASCII class on BOTH sides: Python re's unicode \s and RE2's
# \s (DuckDB) disagree on \v and  , which would silently break the
# SQL-oracle parity contract
_WS_RUN_RE = re.compile(r"[ \t\r\n\f\v]+")


def normalize_text(texts: pd.Series, form: str = "NFC") -> pd.Series:
    """Training-data canonicalization: unicode normalize (NFC default),
    lowercase, collapse whitespace runs to single spaces, trim.  SQL
    parity: ``trim(regexp_replace(lower(nfc_normalize(text)),
    '[ \\t\\r\\n\\f\\v]+', ' ', 'g'))`` (DuckDB).  Vectorized
    pandas-str except the unicodedata pass (C-level per string,
    bounded per-doc work)."""
    import unicodedata
    s = texts.fillna("").map(lambda t: unicodedata.normalize(form, t))
    s = s.str.lower().str.replace(_WS_RUN_RE, " ", regex=True)
    return s.str.strip(" ")


def fingerprint_md5(texts: pd.Series) -> pd.Series:
    """md5 of the lowercased text — exact-dedup key with a DuckDB oracle
    (``md5(lower(text))``)."""
    return pd.Series([hashlib.md5(t.lower().encode("utf-8")).hexdigest()
                      for t in texts.fillna("")], index=texts.index)


_RH_BASE = np.uint64(1099511628211)


def rolling_fingerprint(texts: pd.Series, window: int = 16) -> np.ndarray:
    """64-bit Karp-Rabin style document fingerprint: min of rolling window
    hashes (shift-resistant, unlike a whole-document hash)."""
    out = np.empty(len(texts), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts.fillna("")):
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            if len(b) == 0:
                out[i] = 0
                continue
            if len(b) <= window:
                h = np.uint64(1469598103934665603)
                for c in b:
                    h = (h * _RH_BASE) ^ np.uint64(c)
                out[i] = h
                continue
            # vectorized rolling polynomial hash over all windows
            powers = np.empty(window, dtype=np.uint64)
            p = np.uint64(1)
            for k in range(window - 1, -1, -1):
                powers[k] = p
                p = p * _RH_BASE
            win = np.lib.stride_tricks.sliding_window_view(b, window).astype(np.uint64)
            hashes = (win * powers).sum(axis=1, dtype=np.uint64)
            out[i] = hashes.min()
    return out


def bpe_train(word_freqs: dict, n_merges: int) -> list:
    """Byte-pair-encoding merge induction over a word-frequency table
    (Sennrich-style: words as char sequences + '</w>', repeatedly merge
    the most frequent adjacent symbol pair; ties break lexicographically
    so training is deterministic).

    The input is the (vocab-bounded) word-frequency table, not the
    corpus — the corpus-scale stage is the distributed word count that
    produces it.  Returns [(rank, left, right, merged, count)]."""
    words = {tuple(w) + ("</w>",): int(n) for w, n in word_freqs.items()}
    merges = []
    for rank in range(n_merges):
        pc: dict = {}
        for sym, n in words.items():
            for i in range(len(sym) - 1):
                pair = (sym[i], sym[i + 1])
                pc[pair] = pc.get(pair, 0) + n
        if not pc:
            break
        (left, right), cnt = sorted(pc.items(),
                                    key=lambda kv: (-kv[1], kv[0]))[0]
        merged = left + right
        new_words = {}
        for sym, n in words.items():
            out, i = [], 0
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == left
                        and sym[i + 1] == right):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + n
        words = new_words
        merges.append((rank, left, right, merged, cnt))
    return merges


def md5_bucket(tokens: pd.Series, n_buckets: int) -> np.ndarray:
    """Hashed-feature bucket per token: low 8 bytes of the md5 digest
    read little-endian, mod ``n_buckets`` — bit-identical to DuckDB's
    ``md5_number_lower(tok) % n_buckets``, so hashed-n-gram feature
    models (DSIR importance weights) keep a SQL oracle.  md5 runs once
    per UNIQUE token per batch (vocab-bounded, same contract as
    fingerprint_md5).  Uniqueness comes from a Python set, NOT
    ``pd.unique``: pandas' khash string table NUL-terminates, so it
    collapses '\\x00' with '' and would silently mis-bucket tokens
    containing NUL bytes (caught by the hypothesis property suite).

    Precondition: ``tokens`` must be null-free (NaN would otherwise
    surface as an opaque 'cannot convert float NaN to integer' in the
    int64 cast) — callers dropna/fillna first; rejected eagerly."""
    if tokens.isna().any():
        raise ValueError("md5_bucket requires non-null tokens "
                         "(dropna/fillna before bucketing)")
    lut = {t: int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[8:16],
                             "little") % n_buckets
           for t in set(tokens)}
    return tokens.map(lut).to_numpy(dtype=np.int64)


def bpe_encode(words, merges) -> list:
    """Apply BPE merge rules (from ``bpe_train``, in rank order) to each
    word; returns one symbol tuple per word.  Replaying the merges in
    rank order reproduces exactly the segmentation the training loop
    produced for in-vocabulary words (Sennrich apply semantics)."""
    out = []
    for w in words:
        sym = list(w) + ["</w>"]
        for _rank, left, right, merged, _cnt in merges:
            if len(sym) < 2:
                break
            new, i = [], 0
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == left
                        and sym[i + 1] == right):
                    new.append(merged)
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            sym = new
        out.append(tuple(sym))
    return out


def compression_ratio(texts: pd.Series, level: int = 6) -> np.ndarray:
    """zlib(compressed)/raw byte ratio per document — the standard cheap
    gibberish/boilerplate signal in training-data pipelines: highly
    repetitive boilerplate compresses far below typical prose, while
    random gibberish stays near (or above) 1.0.  Per-row loop over a
    C-speed codec = bounded per-doc work (same contract as
    fingerprint_md5)."""
    import zlib
    out = np.empty(len(texts), dtype=np.float64)
    for i, t in enumerate(texts.fillna("")):
        b = t.encode("utf-8")
        out[i] = len(zlib.compress(b, level)) / len(b) if b else 0.0
    return out


JSON_INT_RE_CACHE: dict = {}


def json_scalar_int64(s: pd.Series, key: str) -> pd.Series:
    """Extract a top-level integer field from a flat JSON-string column
    → nullable Int64.  VECTORIZED fast path: one compiled-regex
    ``str.extract`` over the whole column (JSON object syntax for a
    scalar int field admits exactly this token shape); rows the regex
    does not match (absent key, non-int value, nesting) fall back to
    per-row ``json.loads`` — a bounded tail, not the hot path.  Exact
    for FLAT objects (props-style metadata columns, the documented
    contract); values embedded inside JSON strings that mimic the
    ``"key": int`` token shape could fool the fast path, so route
    nested/adversarial payloads through a real parser stage instead."""
    import json as _json
    import re as _re
    pat = JSON_INT_RE_CACHE.get(key)
    if pat is None:
        pat = _re.compile(
            r'[{,]\s*"' + _re.escape(key) + r'"\s*:\s*(-?\d+)\s*[,}]')
        JSON_INT_RE_CACHE[key] = pat
    s = s.fillna("")
    out = s.str.extract(pat, expand=False)
    got = out.notna()
    vals = pd.array(out, dtype="Int64")
    if not bool(got.all()):
        # fallback tail: only rows the fast path could not claim
        for i in np.nonzero(~got.to_numpy())[0]:
            try:
                v = _json.loads(s.iloc[i]).get(key)
                if isinstance(v, bool) or not isinstance(v, int):
                    v = None
            except (ValueError, AttributeError):
                v = None
            vals[i] = v
    return pd.Series(vals, index=s.index)
