"""Command-line entry point: run any registered operator from a shell.

Usage:
    python -m storm_netmonitor_spark list [substring]
    python -m storm_netmonitor_spark run <query_id> [--sf-dir DIR] [--limit N]
    python -m storm_netmonitor_spark explain <query_id> [--sf-dir DIR]
    python -m storm_netmonitor_spark prune-artifacts [--max-age-days N]

The reference tool is operated from a shell; this is the equivalent
surface here — every SURVEY §2 operator is invocable by id against any
testdata directory, printing results (or the physical plan) to stdout.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="storm_netmonitor_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered operator ids")
    p_list.add_argument("substring", nargs="?", default="")

    for name in ("run", "explain"):
        p = sub.add_parser(name)
        p.add_argument("query_id")
        p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if name == "run":
            p.add_argument("--limit", type=int, default=20)

    p_prune = sub.add_parser(
        "prune-artifacts",
        help="drop trained-artifact store entries older than --max-age-days",
    )
    p_prune.add_argument("--max-age-days", type=float, default=14.0)

    args = parser.parse_args(argv)

    if args.cmd == "prune-artifacts":
        from .io import artifact_root, prune_artifacts

        n = prune_artifacts(max_age_days=args.max_age_days)
        print(f"pruned {n} entr{'y' if n == 1 else 'ies'} from {artifact_root()}")
        return 0

    from . import registry

    registry.load_all()

    if args.cmd == "list":
        for qid in sorted(registry.QUERIES):
            if args.substring in qid:
                kind = "hash" if qid in registry.ORACLES else "rows"
                print(f"{qid}\t{kind}")
        return 0

    if args.query_id not in registry.QUERIES:
        print(f"unknown query id: {args.query_id}", file=sys.stderr)
        return 2

    from .session import get_spark

    spark = get_spark(app_name=f"nm-cli-{args.cmd}")
    try:
        df = registry.QUERIES[args.query_id](spark, args.sf_dir)
        if args.cmd == "explain":
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
