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


def cmd_compact(args) -> int:
    from mapreduce_rust_spark.sinks.compact import compact_parquet
    spark = _get_spark(args.cpus)
    n = compact_parquet(spark, args.src, args.dst,
                        target_bytes=args.target_mb * 1024 * 1024)
    print(f"compacted {args.src} -> {args.dst} ({n} files)")
    return 0


def cmd_zorder(args) -> int:
    from mapreduce_rust_spark.sinks.layout import write_zordered
    spark = _get_spark(args.cpus)
    df = spark.read.parquet(args.src)
    write_zordered(df, args.dst, args.col_x, args.col_y, args.n_files)
    print(f"z-ordered {args.src} on ({args.col_x}, {args.col_y}) "
          f"-> {args.dst} ({args.n_files} files)")
    return 0


def cmd_merge(args) -> int:
    from mapreduce_rust_spark.operators.merge import merge_upsert
    spark = _get_spark(args.cpus)
    target = spark.read.parquet(args.target)
    source = spark.read.parquet(args.source)
    merged = merge_upsert(target, source, args.key)
    # parquet overwrite-while-reading is not transactional; stage the
    # merged snapshot before swapping in (a table format makes this
    # atomic — the plan is the portable part)
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        args.target if args.in_place else args.output)
    dest = args.target if args.in_place else args.output
    print(f"merged {args.source} into {args.target} -> {dest}")
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

    c = sub.add_parser("compact", help="rewrite small parquet files")
    c.add_argument("--src", required=True)
    c.add_argument("--dst", required=True)
    c.add_argument("--target-mb", type=int, default=128)
    c.add_argument("--cpus", type=int, default=None)
    c.set_defaults(fn=cmd_compact)

    z = sub.add_parser("zorder", help="rewrite parquet Z-order clustered")
    z.add_argument("--src", required=True)
    z.add_argument("--dst", required=True)
    z.add_argument("--col-x", required=True)
    z.add_argument("--col-y", required=True)
    z.add_argument("--n-files", type=int, default=16)
    z.add_argument("--cpus", type=int, default=None)
    z.set_defaults(fn=cmd_zorder)

    m = sub.add_parser("merge", help="MERGE (upsert) source into target")
    m.add_argument("--target", required=True, help="target parquet dir")
    m.add_argument("--source", required=True, help="changeset parquet dir")
    m.add_argument("--key", required=True)
    g = m.add_mutually_exclusive_group(required=True)
    g.add_argument("--output", help="write merged snapshot here")
    g.add_argument("--in-place", action="store_true",
                   help="overwrite the target with the merged snapshot")
    m.add_argument("--cpus", type=int, default=None)
    m.set_defaults(fn=cmd_merge)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
