"""Command-line entry point — parity with the reference's CLI
(/root/reference/src/main.rs:26–37: positional input + ``--output``).

    python -m mysqldump_to_parquet_spark.cli dump.sql[.gz] --output out/

Differences from the reference, by design:
* no stdin mode (a distributed engine reads paths; ``-`` is rejected with
  a pointer to this note);
* output is one Parquet *directory* per table (multi-part, scalable), not
  one file;
* ``--compression`` exposes the Parquet codec (default snappy, like the
  reference's hardcoded choice).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="mysqldump_to_parquet_spark",
        description="Convert a MySQL logical dump to one Parquet dataset per table.",
    )
    ap.add_argument(
        "input",
        help="path to .sql or .sql.gz dump (glob ok). stdin ('-') is not "
        "supported — a distributed engine reads paths; pipe users should "
        "spool first: mysqldump db > /tmp/db.sql && %(prog)s /tmp/db.sql -o out/",
    )
    ap.add_argument("--output", "-o", required=True, help="output directory")
    ap.add_argument("--compression", default="snappy")
    ap.add_argument(
        "--multiline",
        choices=("auto", "never"),
        default="auto",
        help="'auto' (default) falls back to whole-file statement reassembly "
        "for dumps whose INSERTs span lines (no --extended-insert); 'never' "
        "errors instead, enforcing the splittable one-line layout",
    )
    ap.add_argument("--master", default=None, help="Spark master (default local[cores])")
    ap.add_argument(
        "--export",
        metavar="TABLE",
        default=None,
        help="reverse direction: treat INPUT as a Parquet dataset and write "
        "it to OUTPUT as mysqldump-style .sql files (00-schema.sql DDL + "
        "extended INSERTs) under the given table name",
    )
    args = ap.parse_args(argv)

    if args.input == "-":
        print(
            "stdin is not supported: a distributed engine reads (many) paths; "
            "spool first (mysqldump db > /tmp/db.sql) and pass the file path "
            "(reference parity note: src/main.rs:56 reads stdin — single-node "
            "streaming has no distributed analog)",
            file=sys.stderr,
        )
        return 2

    from .session import get_spark
    from .sources.mysqldump import convert_dump

    spark = get_spark(app_name="mysqldump-to-parquet", master=args.master)
    try:
        if args.export:
            from .sources.dump_datasource import register

            register(spark)
            df = spark.read.parquet(args.input)
            (
                df.write.format("mysqldump")
                .option("path", args.output)
                .option("table", args.export)
                .mode("append")
                .save()
            )
            print(
                json.dumps(
                    {"exported": args.export, "rows": df.count(), "output": args.output}
                )
            )
            return 0
        counts = convert_dump(
            spark,
            args.input,
            args.output,
            compression=args.compression,
            progress=True,
            multiline=args.multiline,
        )
        print(json.dumps({"tables": counts, "output": args.output}))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
