"""One-shot / REPL CLI (reference: columnq-cli, columnq-cli/src/main.rs:
``columnq sql 'SELECT ...' -t name=uri`` with table/json/csv/parquet/arrow
output, plus an interactive console with readline history)."""

from __future__ import annotations

import argparse
import sys


def _print_table(df) -> None:
    # one job: collect once and render driver-side (df.show(df.count())
    # would run the query twice), matching the encoders' single-pass shape
    rows = df.collect()
    cols = df.columns
    cells = [[("NULL" if v is None else str(v)) for v in row] for row in rows]
    widths = [
        max(len(c), *(len(r[i]) for r in cells)) if cells else len(c)
        for i, c in enumerate(cols)
    ]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    print(sep)
    print("|" + "|".join(f" {c:<{widths[i]}} " for i, c in enumerate(cols)) + "|")
    print(sep)
    for r in cells:
        print("|" + "|".join(f" {v:<{widths[i]}} " for i, v in enumerate(r)) + "|")
    print(sep)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser("roapi_spark.cli")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sql = sub.add_parser("sql", help="one-shot SQL (omit query for a REPL)")
    sql.add_argument("query", nargs="?", help="SQL; omitted -> interactive console")
    sql.add_argument("-t", "--table", action="append", default=[], help="name=uri[,opt=val]")
    sql.add_argument(
        "-o",
        "--output",
        default="table",
        choices=["table", "json", "csv", "parquet", "arrow", "arrows"],
    )
    sql.add_argument(
        "-d",
        "--disable-read-only",
        action="store_true",
        help="allow SQL DML (INSERT/UPDATE/DELETE/MERGE) against "
        "delta-backed tables — same flag as the server",
    )
    args = ap.parse_args(argv)

    from roapi_spark.catalog import Catalog
    from roapi_spark.config import parse_table_uri_arg
    from roapi_spark.encoders import encode_dataframe
    from roapi_spark.session import get_spark

    spark = get_spark("roapi_spark_cli")
    cat = Catalog(spark, read_only=not args.disable_read_only)
    for t in args.table:
        cat.load_table(parse_table_uri_arg(t))

    def run_one(q: str) -> None:
        df = cat.query_sql(q)
        if args.output == "table":
            _print_table(df)
        else:
            out = encode_dataframe(df, args.output)
            sys.stdout.buffer.write(out)
            sys.stdout.buffer.write(b"\n")

    if args.query:
        run_one(args.query)
        return 0

    # interactive console (columnq-cli/src/main.rs:46-100)
    import readline  # noqa: F401 — line editing + history

    while True:
        try:
            line = input("roapi_spark> ").strip()
        except (EOFError, KeyboardInterrupt):
            print()
            return 0
        if not line:
            continue
        if line in ("quit", "exit", r"\q"):
            return 0
        try:
            run_one(line)
        except Exception as exc:  # noqa: BLE001 — REPL keeps going
            print(f"error: {exc}", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
