"""Driver CLI — the ``ray job submit`` entry point.

Subcommands (exit-code contract per the reference CLI, main.rs:52-55:
0 = all partitions passed, 1 = violations found, 2 = error):

  validate   run the flagship corpus validation (resumable)
  synth      write a synthetic interleaved corpus
  compare    score one media pair from the media table (debug; supports
             --strip for the bounded-memory walk and --heatmap PPM out)
  bench      run the benchmark headline

Ray session ownership: this CLI owns its ``ray.init``/``ray.shutdown``
(guarded), unlike the library / __ray_entry__ which never init.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init(num_cpus):
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    return ray


def quality_rating(score: float) -> str:
    """Score → rating bands (main.rs:521-534)."""
    if score < 0.5:
        return "excellent"
    if score < 1.0:
        return "very good"
    if score < 1.5:
        return "good"
    if score < 2.0:
        return "fair"
    if score < 3.0:
        return "poor"
    return "bad"


def write_heatmap_ppm(diffmap, path: str) -> None:
    """Diffmap → blue-cyan-green-yellow-red heatmap (main.rs:461-519
    analog).  ``.png`` paths get a real PNG via the pure-stdlib encoder
    (stages/png.py, matching the reference sink's format); anything
    else is written as binary PPM (pure bytes, zero deps)."""
    import numpy as np
    dm = np.asarray(diffmap, dtype=np.float64)
    mx = dm.max() or 1.0
    v = np.clip(dm / mx, 0.0, 1.0)
    # 4-segment ramp: blue→cyan→green→yellow→red
    r = np.clip(np.interp(v, [0.0, 0.25, 0.5, 0.75, 1.0], [0, 0, 0, 255, 255]), 0, 255)
    g = np.clip(np.interp(v, [0.0, 0.25, 0.5, 0.75, 1.0], [0, 255, 255, 255, 0]), 0, 255)
    b = np.clip(np.interp(v, [0.0, 0.25, 0.5, 0.75, 1.0], [255, 255, 0, 0, 0]), 0, 255)
    img = np.stack([r, g, b], axis=-1).astype(np.uint8)
    h, w = dm.shape
    if path.endswith(".png"):
        from .stages.png import encode_png
        with open(path, "wb") as f:
            f.write(encode_png(img))
        return
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(img.tobytes())


def cmd_validate(args) -> int:
    _ray_init(args.num_cpus)
    from .pipelines.validate import validate_corpus
    try:
        summary = validate_corpus(args.documents, args.media, args.out,
                                  threshold=args.threshold,
                                  resume=not args.no_resume,
                                  baseline_snapshot=args.baseline,
                                  scorer_concurrency=args.concurrency)
    except Exception as exc:  # noqa: BLE001
        print(f"error: {exc}", file=sys.stderr)
        return 2
    print(json.dumps({k: v for k, v in summary.items()
                      if k not in ("media_scores", "score_histogram")}, indent=1))
    return 0 if summary["n_violations"] == 0 else 1


def cmd_synth(args) -> int:
    from .corpus.synth import write_corpus
    paths = write_corpus(args.out, args.n_docs, seed=args.seed,
                         violation_rate=args.violation_rate,
                         n_partitions=args.partitions)
    print(json.dumps(paths))
    return 0


def load_image_file(path: str):
    """Image file → uint8 [h, w, 3] — the reference CLI's file input
    surface (main.rs:396-447).  PNG/PPM/BMP/GIF decode via the
    pure-stdlib codecs (stages/imageio.py); JPEG/WebP need a codec
    wheel."""
    from .stages.imageio import load_image_file as _load
    return _load(path)


def cmd_compare(args) -> int:
    import numpy as np
    from .metric.api import ButteraugliParams, butteraugli_srgb
    from .metric.strip import butteraugli_strip
    if args.ref or args.dist:
        if not (args.ref and args.dist):
            print("error: --ref and --dist must be given together",
                  file=sys.stderr)
            return 2
        try:
            a = load_image_file(args.ref)
            b = load_image_file(args.dist)
        except (ValueError, NotImplementedError, OSError) as exc:
            print(f"error: {exc}", file=sys.stderr)
            return 2
        media_ref = args.ref
    elif not (args.media and args.media_ref):
        print("error: pass either --ref/--dist image files or "
              "--media/--media-ref", file=sys.stderr)
        return 2
    else:
        import pyarrow.parquet as pq
        tbl = pq.read_table(args.media)
        rows = {r: i for i, r in enumerate(tbl["media_ref"].to_pylist())}
        if args.media_ref not in rows:
            print(f"error: media_ref {args.media_ref!r} not found",
                  file=sys.stderr)
            return 2
        i = rows[args.media_ref]
        w = tbl["width"][i].as_py()
        h = tbl["height"][i].as_py()
        a = np.frombuffer(tbl["ref_rgb"][i].as_py(), np.uint8).reshape(h, w, 3)
        b = np.frombuffer(tbl["dist_rgb"][i].as_py(), np.uint8).reshape(h, w, 3)
        media_ref = args.media_ref
    params = ButteraugliParams(compute_diffmap=bool(args.heatmap))
    try:
        if args.strip:
            res = butteraugli_strip(a, b, strip_height=args.strip_height,
                                    params=params)
        else:
            res = butteraugli_srgb(a, b, params)
    except Exception as exc:  # noqa: BLE001
        print(f"error: {exc}", file=sys.stderr)
        return 2
    out = {"media_ref": media_ref, "score": res.score,
           "pnorm_3": res.pnorm_3, "rating": quality_rating(res.score)}
    if args.max_score is not None:
        out["threshold_exceeded"] = res.score > args.max_score
    print(json.dumps(out))
    if args.heatmap:
        write_heatmap_ppm(res.diffmap, args.heatmap)
    if args.max_score is not None and res.score > args.max_score:
        return 1
    return 0


class _FilePairScorer:
    """Actor-pool stage for compare-dirs: load + decode + score one
    batch of (reference, distorted) file pairs.  Decoders and params
    build once per actor; errors become per-row strings (the reference
    --keep-going contract), never exceptions."""

    def __init__(self, params=None):
        from .metric.api import ButteraugliParams
        self.params = params or ButteraugliParams()

    def __call__(self, df):
        import numpy as np
        import pandas as pd
        from .metric.api import butteraugli_srgb
        from .stages.imageio import load_image_file as _load
        scores = np.full(len(df), np.nan)
        pnorms = np.full(len(df), np.nan)
        errors = [None] * len(df)
        for i, (rp, dp) in enumerate(zip(df["ref_path"], df["dist_path"])):
            try:
                a = _load(rp)
                b = _load(dp)
                if a.shape != b.shape:
                    raise ValueError(
                        f"dimension mismatch: {a.shape[1]}x{a.shape[0]} "
                        f"vs {b.shape[1]}x{b.shape[0]}")
                r = butteraugli_srgb(a, b, self.params)
                scores[i], pnorms[i] = r.score, r.pnorm_3
            except (ValueError, NotImplementedError, OSError) as exc:
                errors[i] = f"{type(exc).__name__}: {exc}"
        return pd.DataFrame({"name": df["name"], "score": scores,
                             "pnorm_3": pnorms, "error": errors})


def cmd_compare_dirs(args) -> int:
    """Batch directory mode (main.rs:280-393 semantics): matched
    filenames from two directories, scored by an actor-pool Ray
    stage; exit 1 if any score exceeds --max-score, 2 on errors
    (immediately unless --keep-going) or empty/missing dirs."""
    import os

    if not os.path.isdir(args.reference) or not os.path.isdir(args.distorted):
        print("error: both arguments must be directories", file=sys.stderr)
        return 2
    exts = {e.strip().lower().lstrip(".")
            for e in args.extensions.split(",") if e.strip()}
    pairs = []
    for name in sorted(os.listdir(args.reference)):
        ext = name.rsplit(".", 1)[-1].lower() if "." in name else ""
        if ext not in exts:
            continue
        rp = os.path.join(args.reference, name)
        dp = os.path.join(args.distorted, name)
        if os.path.isfile(rp) and os.path.isfile(dp):
            pairs.append({"name": name, "ref_path": rp, "dist_path": dp})
    if not pairs:
        print("warning: no matching image files found", file=sys.stderr)
        return 2

    _ray_init(args.num_cpus)
    import ray.data as rd
    from .functions.pool import actor_pool
    n_blocks = max(1, min(len(pairs), 4 * (args.concurrency or 4)))
    out = (rd.from_items(pairs, override_num_blocks=n_blocks)
           .map_batches(_FilePairScorer, batch_format="pandas",
                        batch_size=max(1, -(-len(pairs) // n_blocks)),
                        concurrency=actor_pool(args.concurrency or 4))
           .to_pandas().sort_values("name").reset_index(drop=True))

    had_errors = False
    exceeded = False
    rows = []
    for _, r in out.iterrows():
        if r["error"]:
            had_errors = True
            if not args.keep_going:
                print(f"error: {r['name']}: {r['error']}", file=sys.stderr)
                return 2
            rows.append({"name": r["name"], "error": r["error"]})
            continue
        rec = {"name": r["name"], "score": round(float(r["score"]), 6),
               "pnorm_3": round(float(r["pnorm_3"]), 6),
               "rating": quality_rating(float(r["score"]))}
        if args.max_score is not None and r["score"] > args.max_score:
            exceeded = True
            rec["threshold_exceeded"] = True
        rows.append(rec)
    print(json.dumps({"n_pairs": len(rows), "results": rows}, indent=1))
    if exceeded:
        return 1
    if had_errors:
        return 2
    return 0


def cmd_query(args) -> int:
    from .pipelines.queries import QUERIES
    if args.list:
        for name in sorted(QUERIES):
            print(name)
        return 0
    if args.name not in QUERIES:
        print(f"error: unknown query {args.name!r} (use --list)",
              file=sys.stderr)
        return 2
    _ray_init(args.num_cpus)
    out = QUERIES[args.name](args.sf_dir)
    if hasattr(out, "to_pandas") and not hasattr(out, "to_csv"):
        out = out.to_pandas()
    if args.out:
        out.to_parquet(args.out)
        print(json.dumps({"query": args.name, "rows": len(out),
                          "out": args.out}))
    else:
        print(out.to_string(index=False))
    return 0


def cmd_audit(args) -> int:
    """Run a declarative constraint suite (JSON file of spec dicts, or
    the built-in DEFAULT_SUITE) over a table directory.  Exit code
    follows the validate contract: 0 all passed / 1 violations found /
    2 error."""
    from .engine.constraints import (DEFAULT_SUITE, VIOLATION_KEYS,
                                     audit_constraints, violation_rows)
    from .pipelines.queries import _read

    if args.suite:
        with open(args.suite) as f:
            suite = json.load(f)
    else:
        suite = DEFAULT_SUITE
    _ray_init(args.num_cpus)
    read = lambda table, columns: _read(args.sf_dir, table,
                                        columns=columns)
    try:
        out = audit_constraints(read, suite)
    except (ValueError, KeyError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    print(out.to_string(index=False))
    if args.rows and not bool((out["passed"] == 1).all()):
        keys = (json.loads(open(args.keys).read()) if args.keys
                else VIOLATION_KEYS)
        rows = violation_rows(read, suite, keys)
        if args.rows_out:
            rows.to_parquet(args.rows_out)
            print(json.dumps({"violation_rows": len(rows),
                              "out": args.rows_out}))
        else:
            print(rows.head(args.rows_cap).to_string(index=False))
    # severity-aware exit: only ERROR-severity failures gate the job;
    # warn failures are reported above but keep exit 0 (Deequ-style
    # levels — a soft check can't fail the pipeline)
    err_failed = bool(((out["passed"] == 0)
                       & (out["severity"] == "error")).any())
    return 1 if err_failed else 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="butteraugli-ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="run corpus validation")
    v.add_argument("--documents", required=True)
    v.add_argument("--media", required=True)
    v.add_argument("--out", required=True)
    v.add_argument("--threshold", type=float, default=4.0)
    v.add_argument("--baseline", default=None)
    v.add_argument("--no-resume", action="store_true")
    v.add_argument("--concurrency", type=int, default=4)
    v.add_argument("--num-cpus", type=int, default=None)
    v.set_defaults(fn=cmd_validate)

    s = sub.add_parser("synth", help="write synthetic corpus")
    s.add_argument("--out", required=True)
    s.add_argument("--n-docs", type=int, default=1000)
    s.add_argument("--seed", type=int, default=42)
    s.add_argument("--violation-rate", type=float, default=0.01)
    s.add_argument("--partitions", type=int, default=8)
    s.set_defaults(fn=cmd_synth)

    c = sub.add_parser("compare", help="score one media pair")
    c.add_argument("--media", default=None,
                   help="media parquet table (pair mode with --media-ref)")
    c.add_argument("--media-ref", default=None)
    c.add_argument("--ref", default=None,
                   help="reference image file (PNG or binary PPM)")
    c.add_argument("--dist", default=None,
                   help="distorted image file (PNG or binary PPM)")
    c.add_argument("--max-score", type=float, default=None)
    c.add_argument("--strip", action="store_true")
    c.add_argument("--strip-height", type=int, default=256)
    c.add_argument("--heatmap", default=None,
                   help="write diffmap heatmap here (.png → PNG, else PPM)")
    c.set_defaults(fn=cmd_compare)

    d = sub.add_parser("compare-dirs",
                       help="score matched file pairs from two directories")
    d.add_argument("reference", help="directory of reference images")
    d.add_argument("distorted", help="directory of distorted images")
    d.add_argument("--extensions", default="png,ppm,bmp,gif,jpg,jpeg,webp",
                   help="comma-separated extensions to include")
    d.add_argument("--max-score", type=float, default=None)
    d.add_argument("--keep-going", action="store_true",
                   help="continue past per-pair errors (exit 2 at end)")
    d.add_argument("--concurrency", type=int, default=4)
    d.add_argument("--num-cpus", type=int, default=None)
    d.set_defaults(fn=cmd_compare_dirs)

    q = sub.add_parser("query", help="run a registered pipeline query")
    q.add_argument("name", nargs="?", default=None)
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--out", default=None, help="write result parquet here")
    q.add_argument("--list", action="store_true", help="list query names")
    q.add_argument("--num-cpus", type=int, default=None)
    q.set_defaults(fn=cmd_query)

    a = sub.add_parser("audit", help="run a declarative constraint suite")
    a.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    a.add_argument("--suite", default=None,
                   help="JSON file of constraint specs (default: "
                        "built-in DEFAULT_SUITE)")
    a.add_argument("--rows", action="store_true",
                   help="also emit violation rows for failed checks")
    a.add_argument("--rows-out", default=None,
                   help="write violation rows parquet here")
    a.add_argument("--rows-cap", type=int, default=50)
    a.add_argument("--keys", default=None,
                   help="JSON file mapping table -> key column "
                        "(default: built-in VIOLATION_KEYS)")
    a.add_argument("--num-cpus", type=int, default=None)
    a.set_defaults(fn=cmd_audit)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
