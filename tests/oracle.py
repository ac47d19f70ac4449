"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registry query on Spark and its oracle SQL on DuckDB at
sf0.01, then compares row count, column-name set, and
order-insensitive values (columns sorted by name, rows sorted,
floats canonicalized to 9 significant decimals).
"""

from __future__ import annotations

import math

import pandas as pd


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for tup in df.itertuples(index=False, name=None):
        canon_row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon_row.append("<NULL>")
            elif isinstance(v, float):
                # full precision: catch every cross-engine ulp diff the
                # driver's value hash could catch
                canon_row.append(repr(v))
            elif isinstance(v, pd.Timestamp):
                canon_row.append(v.isoformat())
            else:
                canon_row.append(str(v))
        rows.append(tuple(canon_row))
    return sorted(rows)


def assert_matches_oracle(spark, duck, query_fn, oracle: str, sf_dir: str) -> None:
    got = query_fn(spark, sf_dir).toPandas()
    want = duck.execute(oracle).fetchdf()
    assert sorted(map(str.lower, got.columns)) == sorted(map(str.lower, want.columns)), (
        f"schema mismatch: spark={sorted(got.columns)} duckdb={sorted(want.columns)}"
    )
    want.columns = [c.lower() for c in want.columns]
    got.columns = [c.lower() for c in got.columns]
    assert len(got) == len(want), f"row count: spark={len(got)} duckdb={len(want)}"
    g, w = _canon(got), _canon(want)
    if g != w:
        diffs = [(a, b) for a, b in zip(g, w) if a != b][:5]
        raise AssertionError(f"value mismatch; first diffs: {diffs}")
