"""Host fingerprint for numerical-pin gating.

The banded-GEMM blur dispatches into whatever BLAS kernel numpy picked
for this microarchitecture, so f64 score bit patterns are stable only
per (CPU model, CPU feature flags, numpy build).  Pins captured with
this fingerprint are asserted BIT-EXACTLY when the fingerprint matches
the current machine, and only relatively (see tests/test_bitpattern_pins
SELF_RELATIVE) when it doesn't — the same split the reference makes
between per-ISA pins and its cross-arch tolerance
(/root/reference/butteraugli/tests/cross_arch_parity.rs:25-33).
"""

import hashlib

import numpy as np


def host_fingerprint() -> str:
    """Stable digest of (CPU model name, CPU flags, numpy version)."""
    model, flags = "", ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not model and line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                elif not flags and line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                if model and flags:
                    break
    except OSError:
        pass
    raw = "\x1f".join([model, flags, np.__version__])
    return hashlib.sha256(raw.encode()).hexdigest()[:16]
