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
    """Image file → uint8 [h, w, 3] — the reference CLI's two-file
    input surface (main.rs:396-447).  PNG decodes via the pure-stdlib
    codec (stages/png.py); binary PPM (P6) parses directly; other
    formats need a codec wheel."""
    import numpy as np
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        from .stages.png import decode_png
        return decode_png(data)
    if data[:2] == b"P6":
        # header: P6 <w> <h> <maxval>, whitespace/comment tolerant
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(data) and data[pos:pos + 1].isspace():
                pos += 1
            if data[pos:pos + 1] == b"#":
                while pos < len(data) and data[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(data) and not data[pos:pos + 1].isspace():
                pos += 1
            fields.append(int(data[start:pos]))
        w, h, maxval = fields
        if maxval != 255:
            raise ValueError(f"PPM maxval {maxval} unsupported")
        pos += 1                                 # single whitespace
        return np.frombuffer(data[pos:pos + w * h * 3],
                             np.uint8).reshape(h, w, 3)
    raise ValueError(
        f"unrecognized image format in {path!r} (PNG and binary PPM "
        "are built in; other formats need an image library)")


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
