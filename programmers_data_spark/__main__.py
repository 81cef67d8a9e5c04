"""Command-line entry point: ``python -m programmers_data_spark``.

The reference's user surface is "trigger a DAG and look at the
resulting table"; the equivalent here is running a named query
against a fixture directory. Subcommands:

- ``list``              — every registered query (oracle-backed or
                          rows-only).
- ``run NAME``          — execute a query, print N rows.
- ``explain NAME``      — print the formatted physical plan (the
                          scale-review tool: check pushdown,
                          broadcast, codegen spans).
- ``audit``             — lint every query's plan against the scale
                          policy (plan_audit allowlists).
- ``sql STMT``          — ad-hoc Spark SQL over the fixture views —
                          the reference user's native interface
                          (their DAGs ship SQL strings; here the
                          same SQL runs on Spark directly).
"""

from __future__ import annotations

import argparse
import sys

from . import registry
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="programmers_data_spark")
    p.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.01",
        help="fixture directory with the parquet tables",
    )
    p.add_argument("--master", default=None, help="Spark master override")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")
    run = sub.add_parser("run", help="run a named query")
    run.add_argument("name")
    run.add_argument("-n", "--rows", type=int, default=20)
    ex = sub.add_parser("explain", help="print a query's physical plan")
    ex.add_argument("name")
    sub.add_parser(
        "audit",
        help="lint every query's physical plan against the engine's "
        "scale policy (Python tier, bounded cartesians, bounded "
        "single-partition exchanges)",
    )
    sq = sub.add_parser(
        "sql",
        help="run an ad-hoc Spark SQL statement over the fixture "
        "tables (registered as views) — the reference user's native "
        "interface",
    )
    sq.add_argument("statement")
    sq.add_argument("-n", "--rows", type=int, default=20)

    args = p.parse_args(argv)
    registry.load_all()

    if args.cmd == "list":
        oracled = set(registry.ORACLE)
        for name in sorted(registry.QUERIES):
            tag = "oracle" if name in oracled else "rows-only"
            print(f"{name:32s} {tag}")
        return 0

    if args.cmd == "audit":
        from .plan_audit import audit_all

        spark = get_spark(app_name="pds-audit", master=args.master)
        flagged = audit_all(spark, args.sf_dir)
        for name, flags in flagged.items():
            for flag in flags:
                print(f"{name}: {flag}")
        if flagged:
            print(f"{len(flagged)} flagged quer(y/ies)", file=sys.stderr)
            return 1
        print("plan audit clean")
        return 0

    if args.cmd == "sql":
        from .catalog import register_views

        spark = get_spark(app_name="pds-sql", master=args.master)
        register_views(spark, args.sf_dir)
        spark.sql(args.statement).show(args.rows, truncate=False)
        return 0

    if args.name not in registry.QUERIES:
        print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
        return 2

    spark = get_spark(app_name=f"pds-{args.cmd}", master=args.master)
    df = registry.QUERIES[args.name](spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.rows, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
