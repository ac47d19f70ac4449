"""Local mirror of the driver's smoke+correctness pass (verify skill
§1). Run from any cwd: vanilla SparkSession, module loaded by path."""
import importlib.util

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
from pyspark.sql import SparkSession  # noqa: E402

spark = SparkSession.builder.master("local[8]").getOrCreate()
import duckdb  # noqa: E402

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('/root/testdata/sf0.01/{t}.parquet')")
qs, osql = mod.queries(), mod.oracle_sql()
bad, err = [], []
for name, fn in sorted(qs.items()):
    # per-query fault isolation, like the driver: an exception becomes
    # an err row, never an aborted run that hides every later result
    try:
        got = fn(spark, "/root/testdata/sf0.01").toPandas()
        if name not in osql:
            continue
        want = con.execute(osql[name]).fetchdf()
        gv = sorted(map(tuple, got.reindex(sorted(got.columns), axis=1)
                        .astype(str).values))
        wv = sorted(map(tuple, want.reindex(sorted(want.columns), axis=1)
                        .astype(str).values))
        if gv != wv:
            bad.append(name)
    except Exception as e:  # noqa: BLE001
        err.append(name)
        print("ERR", name, repr(e)[:200], flush=True)
print("entry rows:", len(mod.entry(spark).collect()))
print("TOTAL", len(qs), "ORACLED", len(osql),
      "MISMATCH", bad, "ERR", err)
