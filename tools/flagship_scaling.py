"""Flagship-validation scaling evidence: run validate_corpus on a 100k-doc
corpus at two num_cpus levels in fresh processes and report validated
docs/sec + efficiency.  Usage: python tools/flagship_scaling.py [lo hi]
"""

import json
import os
import shutil
import subprocess
import sys
import time


def child(ncpu: int) -> None:
    import ray
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from butteraugli_ray.corpus.synth import write_corpus
    from butteraugli_ray.pipelines.validate import validate_corpus

    paths = write_corpus("/tmp/flagship_corpus_100k", n_docs=100000, seed=42,
                         violation_rate=0.005, n_partitions=64)
    conc = max(2, ncpu - 2)
    best = None
    for trial in range(2):
        out = f"/tmp/flagship_validate_{ncpu}_{trial}"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        s = validate_corpus(paths["documents"], paths["media"], out,
                            resume=False, scorer_concurrency=min(conc, 8),
                            checker_concurrency=conc, batch_size=4096)
        wall = time.time() - t0
        rate = s["n_docs"] / wall
        if best is None or rate > best[0]:
            best = (rate, wall, s["n_violations"])
    print(json.dumps({"ncpu": ncpu, "docs_per_sec": round(best[0], 1),
                      "wall_s": round(best[1], 2),
                      "n_violations": best[2]}))
    ray.shutdown()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
        return
    lo, hi = (int(x) for x in (sys.argv[1:3] or ["7", "28"]))
    res = {}
    for ncpu in (hi, lo):
        out = subprocess.run([sys.executable, os.path.abspath(__file__),
                              "--child", str(ncpu)],
                             capture_output=True, text=True, check=True).stdout
        res[ncpu] = json.loads(out.strip().splitlines()[-1])
    eff = (res[hi]["docs_per_sec"] / res[lo]["docs_per_sec"]) / (hi / lo)
    print(json.dumps({"metric": f"flagship_scaling_{lo}_to_{hi}",
                      f"docs_per_sec_{lo}": res[lo]["docs_per_sec"],
                      f"docs_per_sec_{hi}": res[hi]["docs_per_sec"],
                      "scaling_efficiency": round(eff, 3),
                      "n_docs": 100000}))


if __name__ == "__main__":
    main()
