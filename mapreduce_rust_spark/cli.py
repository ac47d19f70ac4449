"""Command-line front door — the migration path for a reference user.

The reference is driven as binaries (``mrcoordinator 6 4 3`` + N
``mrworker`` processes + ``run.sh`` to merge output,
``src/bin/mrcoordinator.rs:11-17``). This CLI replaces that whole
choreography with single commands:

    python -m mapreduce_rust_spark wc --input 'data/gut-*.txt' \
        --output out/ --reduce-n 4 [--global-sort]
        # = coordinator + workers + run.sh in one process: same
        #   tokenizer rules, reference-framed "key value" text
        #   output, per-partition key-sorted (or one globally
        #   sorted file), WITHOUT the last-group-drop bug.

    python -m mapreduce_rust_spark list
    python -m mapreduce_rust_spark query q1_pricing_summary \
        [--sf-dir DIR] [--explain] [--show N]
        # any of the registry's queries, with the physical plan on
        #   request.
"""

from __future__ import annotations

import argparse
import sys


def _get_spark(cpus: int | None):
    import os
    if cpus:
        os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from mapreduce_rust_spark.session import get_spark
    return get_spark("mapreduce_rust_spark-cli")


def cmd_wc(args) -> int:
    from pyspark.sql import functions as F
    from mapreduce_rust_spark import sources
    from mapreduce_rust_spark.functions.text import tokens
    from mapreduce_rust_spark.sinks import write_kv_text
    spark = _get_spark(args.cpus)
    lines = sources.read_text(spark, args.input)
    counts = (lines.select(F.explode(tokens(F.col("value"))).alias("key"))
                   .filter(F.col("key") != "")
                   .groupBy("key")
                   .agg(F.count("*").cast("string").alias("value")))
    write_kv_text(counts, args.output, num_partitions=args.reduce_n,
                  global_sort=args.global_sort)
    print(f"wrote word counts to {args.output} "
          f"({'globally sorted' if args.global_sort else f'{args.reduce_n} key-sorted partitions'})")
    return 0


def cmd_list(_args) -> int:
    from mapreduce_rust_spark import registry
    oracles = registry.oracles()
    for name in sorted(registry.queries()):
        print(f"{name}\t{'oracled' if name in oracles else 'rows-only'}")
    return 0


def cmd_query(args) -> int:
    from mapreduce_rust_spark import registry
    qs = registry.queries()
    if args.name not in qs:
        print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
        return 2
    spark = _get_spark(args.cpus)
    df = qs[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}")
    else:
        df.show(args.show, truncate=False)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="mapreduce_rust_spark",
                                description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    w = sub.add_parser("wc", help="reference word-count job on text files")
    w.add_argument("--input", required=True,
                   help="text file glob (e.g. 'data/gut-*.txt')")
    w.add_argument("--output", required=True, help="output directory")
    w.add_argument("--reduce-n", type=int, default=4,
                   help="output partitions (reference's reduce_n)")
    w.add_argument("--global-sort", action="store_true",
                   help="one globally sorted file (reference's run.sh)")
    w.add_argument("--cpus", type=int, default=None)
    w.set_defaults(fn=cmd_wc)

    l = sub.add_parser("list", help="list registered queries")
    l.set_defaults(fn=cmd_list)

    q = sub.add_parser("query", help="run a registered query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--explain", action="store_true")
    q.add_argument("--show", type=int, default=20)
    q.add_argument("--output", default=None,
                   help="write result parquet here instead of showing")
    q.add_argument("--cpus", type=int, default=None)
    q.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
