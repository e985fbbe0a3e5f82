"""CLI entry point: the engine's equivalent of the reference's binaries.

The reference runs jobs as `mrcoordinator 8 10 3` + N `mrworker`
processes + `make generate` (reference ``src/start.sh``,
``src/Makefile:8-10``). Here one command runs any registry query or a
word-count job over arbitrary text files — Spark supplies the workers.

    python -m mapreduce_rs_spark list
    python -m mapreduce_rs_spark run q1_pricing_summary --sf-dir /root/testdata/sf0.01 --show 10
    python -m mapreduce_rs_spark run wordcount --output /tmp/wc_parquet
    python -m mapreduce_rs_spark wordcount 'src/resource/pg-*.txt' --output /tmp/final
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="mapreduce_rs_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registry queries")

    run = sub.add_parser("run", help="run a registry query")
    run.add_argument("query")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run.add_argument("--show", type=int, default=20, help="rows to print (0: just count)")
    run.add_argument("--output", help="write result parquet here instead of printing")
    run.add_argument("--explain", action="store_true", help="print the physical plan")

    sq = sub.add_parser("sql", help="run ad-hoc SQL over the catalog views")
    sq.add_argument("text", help="SQL statement (tables: region nation customer supplier part orders lineitem events documents embeddings)")
    sq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    sq.add_argument("--show", type=int, default=20)

    wc = sub.add_parser("wordcount", help="word count over text files (the reference app)")
    wc.add_argument("path", help="text file path/glob")
    wc.add_argument("--output", help="write sorted 'word count' text files here")
    wc.add_argument("--show", type=int, default=20)

    args = parser.parse_args(argv)

    from mapreduce_rs_spark.plans.registry import QUERIES

    if args.cmd == "list":
        for name, spec in sorted(QUERIES.items()):
            kind = "oracle-checked" if spec.oracle else "rows-only"
            print(f"{name:40s} [{kind}] {spec.doc}")
        return 0

    # Validate before paying the multi-second JVM launch.
    if args.cmd == "run" and args.query not in QUERIES:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2

    from mapreduce_rs_spark.session import get_spark

    spark = get_spark("cli")

    if args.cmd == "run":
        df = QUERIES[args.query].fn(spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        if args.output:
            df.write.mode("overwrite").parquet(args.output)
            print(f"wrote {args.output}")
        elif args.show:
            df.show(args.show, truncate=False)
        else:
            print(f"rows: {df.count()}")
        return 0

    if args.cmd == "sql":
        from mapreduce_rs_spark.sources.catalog import run_sql

        run_sql(spark, args.sf_dir, args.text).show(args.show, truncate=False)
        return 0

    if args.cmd == "wordcount":
        from mapreduce_rs_spark.operators.text_analysis import word_count
        from mapreduce_rs_spark.sources.readers import read_text
        from mapreduce_rs_spark.sources.writers import write_sorted_text

        counts = word_count(read_text(spark, args.path), text_col="value")
        if args.output:
            # The reference's final.txt artifact: sorted "word count" lines.
            write_sorted_text(counts, args.output, key="word", value="cnt")
            print(f"wrote {args.output}")
        else:
            counts.show(args.show, truncate=False)
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
