"""Command-line front end — the reference's Streamlit workflow
(upload -> extract -> infer/version schema -> validate -> store ->
browse, app.py:286-395) as a CLI over EtlPipeline, so a user of the
reference can run the identical loop without a browser:

  python -m dynamic_etl_pipeline_spark ingest FILE [--store DIR]
  python -m dynamic_etl_pipeline_spark records [--latest N] [--store DIR]
  python -m dynamic_etl_pipeline_spark schemas [--store DIR]
  python -m dynamic_etl_pipeline_spark changes [--store DIR]
  python -m dynamic_etl_pipeline_spark export-sqlite DB [--store DIR]
  python -m dynamic_etl_pipeline_spark migrate [--store DIR]

`ingest` prints the reference's end-of-run summary (records stored,
good/bad counts, schema version + change, app.py:339-366); `records`
is the ORDER BY id DESC LIMIT N browse (app.py:169-173); `schemas` /
`changes` mirror the two history views (app.py:155-166);
`export-sqlite` writes the reference's exact etl_data.db table shapes
(app.py:64-93) for downstream tools that expect them.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    # --store lives on a shared parent parser so BOTH documented forms
    # work: `--store DIR ingest FILE` and `ingest FILE --store DIR`
    # (ADVICE r4: root-only --store rejected the subcommand-trailing
    # form the module docstring advertises)
    # subcommand copies default to SUPPRESS: argparse parses the
    # subparser AFTER the root, so a plain default there would clobber
    # a root-supplied `--store DIR`
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--store", default=argparse.SUPPRESS,
                        help="pipeline store directory (default ./etl_store)")
    p = argparse.ArgumentParser(prog="dynamic_etl_pipeline_spark")
    p.add_argument("--store", default="./etl_store",
                   help="pipeline store directory (default ./etl_store)")
    sub = p.add_subparsers(dest="cmd", required=True)
    pi = sub.add_parser("ingest", parents=[common],
                        help="ingest a file (csv/json/xml/txt/...)")
    pi.add_argument("file")
    pi.add_argument("--format", default=None,
                    help="override suffix-based format dispatch")
    pr = sub.add_parser("records", parents=[common],
                        help="browse latest records")
    pr.add_argument("--latest", type=int, default=50)
    sub.add_parser("schemas", parents=[common],
                   help="schema version history")
    sub.add_parser("changes", parents=[common],
                   help="schema change log")
    pe = sub.add_parser("export-sqlite", parents=[common],
                        help="write the reference-shaped SQLite artifact")
    pe.add_argument("db")
    sub.add_parser("migrate", parents=[common],
                   help="conform drifted store partitions to the "
                        "union schema (EtlPipeline.migrate)")
    args = p.parse_args(argv)

    from .pipeline import EtlPipeline
    from .session import get_spark

    spark = get_spark("dynamic-etl-pipeline-cli")
    pipe = EtlPipeline(spark, args.store)

    if args.cmd == "ingest":
        kwargs = {"format": args.format} if args.format else {}
        rep = pipe.ingest(args.file, **kwargs)
        print(json.dumps({
            "stored": rep.n_records,
            "good": rep.n_good,
            "with_issues": rep.n_with_issues,
            "schema_version": rep.schema_version,
            "schema_changed": rep.schema_changed,
        }))
    elif args.cmd == "records":
        for row in pipe.records(latest_n=args.latest).toJSON().collect():
            print(row)
    elif args.cmd == "schemas":
        for row in pipe.registry.history().toJSON().collect():
            print(row)
    elif args.cmd == "changes":
        for row in pipe.registry.changes().toJSON().collect():
            print(row)
    elif args.cmd == "export-sqlite":
        n = pipe.export_sqlite(args.db)
        print(json.dumps({"exported_records": n, "db": args.db}))
    elif args.cmd == "migrate":
        n = pipe.migrate()
        print(json.dumps({"partitions_rewritten": n}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
