"""Capture host-local f64 bit-pattern pins for tests/test_bitpattern_pins.

Writes butteraugli_ray/fixtures/self_pins_host.json with the current
host fingerprint (butteraugli_ray.hostinfo) and the engine's score bits
for every pinned case.  When the recorded fingerprint matches the test
machine, the pin test asserts BIT-EXACT equality against this file;
otherwise it falls back to the relative cross-host gate.

Run after any intentional numerical change (golden parity must still
pass first):  python tools/capture_pins.py
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from butteraugli_ray.corpus.generators import generate_image_pair  # noqa: E402
from butteraugli_ray.hostinfo import host_fingerprint  # noqa: E402
from butteraugli_ray.metric import butteraugli_srgb  # noqa: E402
from tests.test_bitpattern_pins import PINS  # noqa: E402


def main() -> None:
    pins = {}
    for name, w, h, _self, _ref in PINS:
        pair = generate_image_pair(name, w, h)
        score = np.float64(butteraugli_srgb(*pair).score)
        pins[f"{name}_{w}x{h}"] = f"0x{int(score.view(np.uint64)):016X}"
        print(f"{name}_{w}x{h}: {pins[f'{name}_{w}x{h}']} ({score!r})")
    out = {"fingerprint": host_fingerprint(), "pins": pins}
    path = (Path(__file__).resolve().parent.parent / "butteraugli_ray"
            / "fixtures" / "self_pins_host.json")
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {path} (fingerprint {out['fingerprint']})")


if __name__ == "__main__":
    main()
