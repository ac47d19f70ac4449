"""Source/sink roundtrips: csv, json, text, kv-text, parquet."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mapreduce_rust_spark import sources
from tests.conftest import SF_SMOKE

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("score", T.DoubleType()),
])

ROWS = [(1, "a", 1.5), (2, "b", -2.0), (3, "c,with,commas", 0.0)]


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    p = str(tmp_path / "csv")
    df.write.mode("overwrite").option("header", True).csv(p)
    back = sources.read_csv(spark, p, SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(ROWS)


def test_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    p = str(tmp_path / "json")
    df.write.mode("overwrite").json(p)
    back = sources.read_json(spark, p, SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(ROWS)


def test_text_scan_with_split_identity(spark, tmp_path):
    (tmp_path / "gut-0.txt").write_text("hello world\nfoo\n")
    (tmp_path / "gut-1.txt").write_text("bar\n")
    df = sources.read_text(spark, str(tmp_path / "gut-*.txt"))
    rows = df.collect()
    assert len(rows) == 3
    assert all(r.split_file.endswith((".txt",)) for r in rows)
    assert {r.value for r in rows} == {"hello world", "foo", "bar"}


def test_kv_text_roundtrip(spark, tmp_path):
    from mapreduce_rust_spark.sinks import write_kv_text
    df = spark.createDataFrame([("k1", "7"), ("k2", "9")], ["key", "value"])
    p = str(tmp_path / "kv")
    write_kv_text(df, p, num_partitions=2)
    back = sources.read_kv_text(spark, p)
    assert sorted(map(tuple, back.collect())) == [("k1", "7"), ("k2", "9")]


def test_parquet_sink_partitioned(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    p = str(tmp_path / "parts")
    docs.write.mode("overwrite").partitionBy("lang").parquet(p)
    back = spark.read.parquet(p)
    assert back.count() == docs.count()
    # partition pruning: a lang filter must prune directories
    pruned = back.filter(F.col("lang") == "en")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == docs.filter(F.col("lang") == "en").count()
    assert "PartitionFilters" in plan or "lang=en" in plan


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC sink+source roundtrip, and the scan must take pushed
    filters like parquet (the columnar-format contract)."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    p = str(tmp_path / "orc")
    df.write.mode("overwrite").orc(p)
    back = sources.read_orc(spark, p)
    assert sorted(map(tuple, back.collect())) == sorted(ROWS)
    scan = (back.filter(F.col("id") > 1)
                ._jdf.queryExecution().sparkPlan().toString())
    assert "PushedFilters: [" in scan and "GreaterThan(id,1)" in scan


def test_dynamic_partition_pruning(spark, tmp_path):
    """Partition-pruned join: a fact table partitioned on the join key
    must scan ONLY the partitions matching the dim filter — the plan
    carries a dynamicpruning subquery on the fact scan's partition
    filters. At 100 TB this is the difference between reading one
    day's partitions and the whole table when the predicate lives on
    the dim side."""
    from tests.conftest import SF_SMOKE
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    p = str(tmp_path / "fact")
    (orders.withColumn("status", F.col("o_orderstatus"))
           .write.mode("overwrite").partitionBy("status").parquet(p))
    fact = spark.read.parquet(p)
    dim = spark.createDataFrame(
        [("O", "open"), ("F", "filled"), ("P", "pending")],
        ["status", "status_name"]).filter(F.col("status_name") == "open")
    joined = fact.join(dim, "status").groupBy("status_name").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert joined.collect()[0]["count"] == \
        orders.filter(F.col("o_orderstatus") == "O").count()


def test_compact_parquet_merges_small_files(spark, tmp_path):
    """200 tiny files in → size-derived few files out, same rows."""
    import glob
    from mapreduce_rust_spark.sinks.compact import compact_parquet
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    src = str(tmp_path / "fragmented")
    docs.repartition(200).write.mode("overwrite").parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 200
    dst = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, dst)
    out_files = glob.glob(f"{dst}/part-*.parquet")
    assert len(out_files) == n < 10
    back = spark.read.parquet(dst)
    assert back.count() == docs.count()
    assert sorted(back.columns) == sorted(docs.columns)


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """mergeSchema reads a dataset whose later files added a column —
    the append-only schema-evolution contract a long-lived 100 TB
    table needs."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], ["id", "name"]) \
        .write.mode("overwrite").parquet(p)
    spark.createDataFrame([(2, "b", 9.5)], ["id", "name", "score"]) \
        .write.mode("append").parquet(p)
    back = spark.read.option("mergeSchema", True).parquet(p)
    assert sorted(back.columns) == ["id", "name", "score"]
    rows = {r.id: (r.name, r.score) for r in back.collect()}
    assert rows[1] == ("a", None) and rows[2] == ("b", 9.5)


def test_json_corrupt_record_capture(spark, tmp_path):
    """PERMISSIVE JSON ingestion must keep malformed rows in
    _corrupt_record instead of failing the job — the resilience
    contract for crawling 100 TB of found data."""
    p = tmp_path / "mixed.json"
    p.write_text('{"id": 1, "name": "ok"}\n'
                 'NOT JSON AT ALL\n'
                 '{"id": 2, "name": "also ok"}\n')
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ])
    df = (spark.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(str(p))).cache()
    assert df.count() == 3
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert {r.id for r in good.collect()} == {1, 2}
    assert bad.count() == 1 and "NOT JSON" in bad.collect()[0]._corrupt_record
    df.unpersist()
