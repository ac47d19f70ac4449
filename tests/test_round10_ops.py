"""Behavioral tests for the round-10 crop and round-10 hardening —
properties the oracle mirror cannot see (degenerate inputs absent
from the fixtures, gate paths, planted worst cases).
"""

from __future__ import annotations

import duckdb
import pandas as pd


def _duck_on(tmp_path, *tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet')")
    return con


def test_bpe_encode_oracle_survives_vocab_exhaustion(spark, tmp_path):
    """r9 advice: a corpus whose pair vocabulary exhausts before
    N_MERGES rounds used to EMPTY the oracle's symbol table (the
    ``w{r} = w{r-1} CROSS JOIN m{r}`` round with an empty argmax),
    reporting n_tokens=0 for every doc while Spark (whose trainer
    breaks early) reported true counts. The LEFT JOIN ON TRUE +
    COALESCE carry must keep the two engines hash-agreed."""
    from mapreduce_rust_spark.llm.bpe import (
        _bpe_encode_oracle, bpe_encode_docs)

    # "ab" admits exactly one merge; "c d" admits none. Exhaustion
    # after round 1 << N_MERGES.
    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "source": ["a", "a"],
        "text": ["ab ab c", "c d"],
    })
    docs.to_parquet(tmp_path / "documents.parquet")

    got = {r.doc_id: (r.n_tokens, r.n_subwords, r.fertility)
           for r in bpe_encode_docs(spark, str(tmp_path)).collect()}
    # doc 1: 3 tokens; "ab"x2 -> 1 subword each, "c" -> 1  => 3
    # doc 2: 2 tokens; "c","d" -> 1 each                   => 2
    assert got[1] == (3, 3, 1.0)
    assert got[2] == (2, 2, 1.0)

    con = _duck_on(tmp_path, "documents")
    want = {int(r["doc_id"]): (int(r["n_tokens"]), int(r["n_subwords"]),
                               float(r["fertility"]))
            for _, r in con.execute(_bpe_encode_oracle()).fetchdf().iterrows()}
    assert want == got


def test_bpe_train_oracle_emits_only_real_rounds_on_exhaustion(
        spark, tmp_path):
    """The train oracle's UNION over m1..mN must yield exactly the
    rounds that fired (empty argmax rounds contribute no rows),
    matching Spark's early-break merge list row-for-row."""
    from mapreduce_rust_spark.llm.bpe import (
        _bpe_train_oracle, bpe_train_merges)

    docs = pd.DataFrame({
        "doc_id": [1],
        "source": ["a"],
        "text": ["ab ab c"],
    })
    docs.to_parquet(tmp_path / "documents.parquet")

    got = [(r.step, r.left, r.right, r.merged, r.pair_count)
           for r in bpe_train_merges(spark, str(tmp_path))
           .orderBy("step").collect()]
    assert got == [(1, "a", "b", "ab", 2)]

    con = _duck_on(tmp_path, "documents")
    want = [tuple(r) for r in con.execute(
        _bpe_train_oracle() + " ORDER BY step").fetchall()]
    assert [(s, l, rg, m, c) for s, l, rg, m, c in want] == got
