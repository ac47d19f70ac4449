"""CLI front door — the reference-user migration path: the wc job
over text files (reference output framing), registry listing, and
query execution. Runs main() in-process against the session fixture
(the CLI reuses the active SparkSession via getOrCreate)."""

from __future__ import annotations

import glob
import re

from mapreduce_rust_spark.cli import main


def test_cli_wc_matches_python_count(spark, tmp_path):
    (tmp_path / "gut-0.txt").write_text("It was, it WAS!\nnot it\n")
    (tmp_path / "gut-1.txt").write_text("was it?\n")
    out = str(tmp_path / "out")
    rc = main(["wc", "--input", str(tmp_path / "gut-*.txt"),
               "--output", out, "--reduce-n", "2"])
    assert rc == 0
    got = {}
    for f in glob.glob(f"{out}/part-*"):
        for line in open(f):
            k, v = line.split()
            got[k] = int(v)
    # reference tokenizer: strip [^\w\s], split whitespace, case kept
    text = "It was, it WAS!\nnot it\nwas it?\n"
    toks = re.sub(r"[^\w\s]", "", text, flags=re.ASCII).split()
    want = {}
    for t in toks:
        want[t] = want.get(t, 0) + 1
    assert got == want


def test_cli_wc_global_sort_single_sorted_file(spark, tmp_path):
    (tmp_path / "gut-0.txt").write_text("b a c a\n")
    out = str(tmp_path / "out")
    rc = main(["wc", "--input", str(tmp_path / "gut-0.txt"),
               "--output", out, "--global-sort"])
    assert rc == 0
    lines = []
    for f in sorted(glob.glob(f"{out}/part-*")):
        lines += [l.split()[0] for l in open(f)]
    assert lines == sorted(lines) and set(lines) == {"a", "b", "c"}


def test_cli_list_and_query(spark, capsys, tmp_path):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary\toracled" in out
    # knn_lsh was the rows-only exemplar until its round-9 oracle
    # promotion; knn_ivf followed in round 10 (exact-grid cells); the
    # float k-means production variant is the remaining rows-only ANN
    assert "knn_lsh\toracled" in out
    assert "knn_ivf\toracled" in out
    assert "kmeans_embeddings\trows-only" in out
    dst = str(tmp_path / "q1")
    assert main(["query", "q1_pricing_summary", "--output", dst]) == 0
    assert spark.read.parquet(dst).count() == 6
    assert main(["query", "no_such_query"]) == 2


def test_cli_merge_upsert(spark, tmp_path):
    from pyspark.sql import Row
    t = str(tmp_path / "t"); s = str(tmp_path / "s"); o = str(tmp_path / "o")
    spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")]).write.parquet(t)
    spark.createDataFrame([Row(k=2, v="B"), Row(k=3, v="c")]).write.parquet(s)
    rc = main(["merge", "--target", t, "--source", s, "--key", "k",
               "--output", o])
    assert rc == 0
    got = {r.k: r.v for r in spark.read.parquet(o).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
