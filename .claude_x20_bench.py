"""Ad-hoc ×20 doc-corpus scaling measurement for new doc-side ops.

Builds (once) a /tmp/x20 fixture dir: sf0.1 documents replicated ×20
with distinct doc_ids; all other tables symlinked from sf0.1. Then
times the requested queries at sf0.1 and ×20 (min of 2, warm JVM).

Usage: python .claude_x20_bench.py q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

SF = "/root/testdata/sf0.1"
X20 = "/tmp/x20"


def build_x20(spark):
    from pyspark.sql import functions as F
    if os.path.exists(os.path.join(X20, "documents.parquet")):
        return
    os.makedirs(X20, exist_ok=True)
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    n = docs.count()
    rep = spark.range(20).withColumnRenamed("id", "rep")
    big = (docs.crossJoin(rep)
           .withColumn("doc_id", F.col("doc_id") + F.col("rep") * n)
           .drop("rep"))
    big.write.mode("overwrite").parquet(
        os.path.join(X20, "documents.parquet"))
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        src = os.path.join(SF, f"{t}.parquet")
        dst = os.path.join(X20, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(src, dst)


def main():
    from mapreduce_rust_spark import registry
    from mapreduce_rust_spark.session import get_spark
    spark = get_spark("x20-bench")
    build_x20(spark)
    qs = registry.queries()
    for name in sys.argv[1:]:
        fn = qs[name]
        for label, d in [("sf0.1", SF), ("x20", X20)]:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, d).collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(f"{name} {label} {best:.2f}s", flush=True)


if __name__ == "__main__":
    main()
