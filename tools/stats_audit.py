"""Per-operator wall/CPU audit of the flagship pipeline via ds.stats().

Runs corpus validation at sf0.001 (or $GRAFT_SF_DIR) and prints Ray
Data's own execution statistics for the heavy scan — the feedback loop
used to size batch_size / concurrency / num_cpus per stage (see
SCALE.md "Cluster sizing lesson").  Standalone script — owns its Ray
session.

    python tools/stats_audit.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
             include_dashboard=False, logging_level="ERROR",
             log_to_driver=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001")
    import hashlib
    import shutil
    from butteraugli_ray.pipelines.queries import build_interleaved_corpus
    from butteraugli_ray.pipelines.validate import validate_corpus

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    corpus_dir = f"/tmp/butteraugli_ray_corpus_{tag}"
    out_dir = f"/tmp/butteraugli_ray_audit_{tag}"
    shutil.rmtree(out_dir, ignore_errors=True)
    paths = build_interleaved_corpus(sf_dir, corpus_dir)
    summary = validate_corpus(paths["documents"], paths["media"], out_dir,
                              resume=False, scorer_concurrency=2)
    stats = summary.get("pipeline_stats")
    if stats:
        print(stats)
    else:
        print("no dataset_stats in summary — validate_corpus ran "
              f"({summary.get('n_documents')} docs, "
              f"{summary.get('n_violations')} violations)")
    ray.shutdown()


if __name__ == "__main__":
    main()
