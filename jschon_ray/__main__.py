"""CLI entry points: `python -m jschon_ray <command> ...`.

The CLI owns the Ray session (the library never calls ray.init — driver
guidance); every command streams from/to parquet|jsonl|csv via the TableIO
seam and prints ONE summary JSON line to stdout.

Commands
  validate    apply a spec (JSON file) to a table; write verdicts and
              violation rows, print the summary
  uniqueness  duplicate keys by column
  profile     sketch profile (count/null/min/max + t-digest/HLL/CM) per column
  dedup       exact content dedup over a column
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_up(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=num_cpus or os.cpu_count(),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def cmd_validate(args) -> dict:
    from .pipelines.validate import validate_dataset, summarize_verdicts
    from .sources.io import read_table, write_table
    from .stages.validate import ViolationExploder

    with open(args.spec) as f:
        spec = json.load(f)
    ds = read_table(args.input, format=args.input_format)
    verdicts = validate_dataset(ds, spec)
    if args.output:
        write_table(verdicts, os.path.join(args.output, "verdicts"))
        verdicts = read_table(os.path.join(args.output, "verdicts"))
        viol = verdicts.map_batches(
            ViolationExploder, batch_format="pyarrow",
            fn_constructor_kwargs=dict(key_cols=args.key_cols.split(",")),
            concurrency=(1, 4))
        write_table(viol, os.path.join(args.output, "violations"))
    return summarize_verdicts(verdicts)


def cmd_uniqueness(args) -> dict:
    from .pipelines.validate import uniqueness_violations
    from .sources.io import read_table, write_table

    ds = read_table(args.input, format=args.input_format,
                    columns=[args.key])
    dupes = uniqueness_violations(ds, args.key)
    if args.output:
        write_table(dupes, args.output)
        from .sources.io import read_table as rt

        dupes = rt(args.output)
    df = dupes.to_pandas()
    return {"n_duplicate_keys": int(len(df)),
            "n_duplicate_rows": int(df["n_rows"].sum()) if len(df) else 0}


def cmd_profile(args) -> dict:
    from .pipelines.stats import profile_dataset
    from .sources.io import read_table

    cols = args.columns.split(",")
    ds = read_table(args.input, format=args.input_format, columns=cols)
    prof = profile_dataset(ds, cols)
    out = {}
    for name, p in prof.columns.items():
        entry = {"count": p.count, "nulls": p.nulls, "min": p.vmin,
                 "max": p.vmax, "distinct_hll": round(p.hll.estimate(), 1)}
        if p.tdigest is not None:
            entry.update(p50=p.tdigest.quantile(0.5),
                         p95=p.tdigest.quantile(0.95),
                         p99=p.tdigest.quantile(0.99))
        out[name] = entry
    if args.output:
        with open(args.output, "w") as f:
            json.dump(out, f, default=str)
    return {"columns": sorted(out), "profile": out}


def cmd_dedup(args) -> dict:
    from .functions.dedup import exact_dedup
    from .sources.io import read_table, write_table

    ds = read_table(args.input, format=args.input_format,
                    columns=[args.id_col, args.content_col])
    kept = exact_dedup(ds, args.id_col, args.content_col)
    if args.output:
        write_table(kept, args.output)
        kept = read_table(args.output)
    return {"n_rows_kept": kept.count()}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="jschon_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--input", required=True)
        p.add_argument("--input-format", default=None,
                       choices=[None, "parquet", "json", "csv"])
        p.add_argument("--output", default=None)

    p = sub.add_parser("validate"); common(p)
    p.add_argument("--spec", required=True)
    p.add_argument("--key-cols", default="clip_id",
                   help="comma-separated id columns carried onto "
                        "violation rows")
    p.set_defaults(fn=cmd_validate)

    p = sub.add_parser("uniqueness"); common(p)
    p.add_argument("--key", default="clip_id")
    p.set_defaults(fn=cmd_uniqueness)

    p = sub.add_parser("profile"); common(p)
    p.add_argument("--columns", required=True)
    p.set_defaults(fn=cmd_profile)

    p = sub.add_parser("dedup"); common(p)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--content-col", default="text")
    p.set_defaults(fn=cmd_dedup)

    args = ap.parse_args(argv)
    _ray_up(args.num_cpus)
    try:
        out = args.fn(args)
        print(json.dumps(out, default=str))
        return 0
    finally:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
