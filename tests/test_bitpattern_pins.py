"""f64 bit-pattern regression pins — the numpy analog of the
reference's tests/cross_arch_parity.rs.

Two gates per case:

1. SELF pin: the engine's own score captured at pin time.  Bit-exact
   (u64 view equality) on the capture host; across hosts the BLAS
   kernel dispatch inside the banded-GEMM blur varies with CPU
   microarchitecture, so the hard gate is relative ≤ SELF_RELATIVE
   (2e-5 — 5x tighter than the reference's own cross-arch tolerance;
   observed host-to-host drift is ≤ 8.5e-6).  Catches any real
   numerical drift from refactors or vectorization changes — the
   single-arch analog of the reference's per-ISA pins.
2. CROSS-ENGINE gate vs the reference's x86_64/AVX2-captured bits
   (cross_arch_parity.rs:36+), at the reference's own
   MAX_RELATIVE_DIFF = 1e-4 (cross_arch_parity.rs:32).  This is a
   genuine cross-architecture claim: Rust+AVX2 FMA vs numpy BLAS agree
   to ≤1e-4 relative (measured ~1e-9 on these cases).

The self pin is BIT-EXACT whenever the recorded host fingerprint
(fixtures/self_pins_host.json, written by tools/capture_pins.py)
matches the current machine — so same-host numerical regressions from
refactors are caught exactly, while host swaps between rounds fall
back to the relative gate.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from butteraugli_ray.corpus.generators import generate_image_pair
from butteraugli_ray.hostinfo import host_fingerprint
from butteraugli_ray.metric import butteraugli_srgb

_HOST_PINS_PATH = (Path(__file__).resolve().parent.parent
                   / "butteraugli_ray" / "fixtures" / "self_pins_host.json")
try:
    _HOST_PINS = json.loads(_HOST_PINS_PATH.read_text())
except OSError:
    _HOST_PINS = {"fingerprint": None, "pins": {}}
_SAME_HOST = _HOST_PINS.get("fingerprint") == host_fingerprint()

MAX_RELATIVE_DIFF = 1e-4   # cross_arch_parity.rs:32
SELF_RELATIVE = 2e-5       # cross-host BLAS dispatch bound (see module doc)

# (case, w, h, this-engine pin, reference x86_64/AVX2 pin or None)
PINS = [
    ("uniform_gray_128_shift_10", 8, 8,
     0x402F88E580000000, 0x402F88E5E0000000),
    ("uniform_gray_128_shift_50", 16, 16,
     0x40592E9780000000, 0x40592E9F80000000),
    ("uniform_gray_128_shift_10", 17, 17,
     0x4035491FA0000000, 0x40354928C0000000),
    ("uniform_gray_128_shift_50", 32, 32,
     0x40592E9CC0000000, 0x40592E9500000000),
    ("uniform_red_shift_20", 16, 16,
     0x403F24C120000000, 0x403F24C500000000),
    ("uniform_green_shift_20", 23, 23,
     0x4044F3F3C0000000, 0x4044F3F5A0000000),
    ("uniform_blue_shift_20", 32, 32,
     0x4028B48BC0000000, 0x4028B48640000000),
    ("gradient_h_shift_15", 9, 9,
     0x401746ADA0000000, 0x401746AAE0000000),
    ("gradient_v_shift_15", 24, 24,
     0x402874D8E0000000, 0x402874DC20000000),
    ("gradient_diag_shift_15", 31, 31, 0x402BC04940000000, None),
    ("color_gradient_shift_15", 16, 16, 0x402187DBE0000000, None),
    ("checkerboard_vs_inverse_2px", 16, 16, 0x4023CC7D40000000, None),
    ("checkerboard_shift_25", 32, 32, 0x40291B0B40000000, None),
    ("gradient_h_shift_15", 64, 48, 0x4037A78A60000000, None),
]


@pytest.mark.parametrize("name,w,h,self_pin,ref_pin", PINS,
                         ids=[f"{n}_{w}x{h}" for n, w, h, _, _ in PINS])
def test_bitpattern_pin(name, w, h, self_pin, ref_pin):
    pair = generate_image_pair(name, w, h)
    score = np.float64(butteraugli_srgb(*pair).score)
    bits = int(score.view(np.uint64))
    host_pin = _HOST_PINS["pins"].get(f"{name}_{w}x{h}")
    if _SAME_HOST and host_pin is not None:
        assert bits == int(host_pin, 16), (
            f"same-host bit drift: {name}_{w}x{h} score {score!r} "
            f"(0x{bits:016X}) != host pin {host_pin} captured on this "
            f"fingerprint. A refactor changed the numerics — if "
            f"intentional and golden parity holds, re-run "
            f"tools/capture_pins.py.")
    if bits != self_pin:
        pinned = float(np.uint64(self_pin).view(np.float64))
        rel = abs(float(score) - pinned) / pinned
        assert rel < SELF_RELATIVE, (
            f"numerical drift: {name}_{w}x{h} score {score!r} "
            f"(0x{bits:016X}) != pinned 0x{self_pin:016X} "
            f"({pinned!r}), rel {rel:.2e} > {SELF_RELATIVE}. If the "
            f"change is intentional and golden parity still holds, "
            f"re-capture the pin.")
    if ref_pin is not None:
        ref = float(np.uint64(ref_pin).view(np.float64))
        rel = abs(float(score) - ref) / ref
        assert rel < MAX_RELATIVE_DIFF, (
            f"{name}_{w}x{h}: {rel:.2e} vs reference AVX2 bits")
