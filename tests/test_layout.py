"""Z-order layout: measured file-level min/max pruning on BOTH
clustered dimensions — the property a linear sort cannot provide."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from mapreduce_rust_spark.sinks.layout import write_zordered
from mapreduce_rust_spark.tables import load_table
from tests.conftest import SF_CORRECT


def _file_envelopes(path: str, col: str):
    """Per-file [min, max] of ``col`` from parquet row-group stats."""
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            los.append(st.min)
            his.append(st.max)
        out.append((min(los), max(his)))
    return out


def _overlap_frac(envelopes, lo, hi):
    hit = sum(1 for e_lo, e_hi in envelopes if e_hi >= lo and e_lo <= hi)
    return hit / len(envelopes)


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    ev = load_table(spark, SF_CORRECT, "events").select(
        "event_id", "user_id", "value")
    zdir = str(tmp_path / "zorder")
    ldir = str(tmp_path / "linear")
    write_zordered(ev, zdir, "user_id", "value", n_files=16)
    # baseline: linear sort on value only (the one-dimension layout)
    (ev.repartitionByRange(16, "value").sortWithinPartitions("value")
       .write.mode("overwrite").parquet(ldir))

    users = sorted(r.user_id for r in ev.select("user_id").collect())
    vals = sorted(r.value for r in ev.select("value").collect())
    assert len(set(users)) > 100

    # quarter-of-ROWS boxes (bottom-quartile band) in each dimension
    # — range-of-values boxes would be distorted by value's skew
    n = len(users)
    u_box = (users[0], users[n // 4])
    v_box = (vals[0], vals[n // 4])

    z_user = _overlap_frac(_file_envelopes(zdir, "user_id"), *u_box)
    z_val = _overlap_frac(_file_envelopes(zdir, "value"), *v_box)
    lin_user = _overlap_frac(_file_envelopes(ldir, "user_id"), *u_box)
    lin_val = _overlap_frac(_file_envelopes(ldir, "value"), *v_box)

    # the tradeoff being bought: linear prunes its sort column well
    # (≤0.5) and the other not at all (1.0); z-order must prune
    # MEANINGFULLY ON BOTH (measured 0.5/0.5 at 16 files)
    assert lin_val <= 0.5
    assert lin_user >= 0.9, "linear layout unexpectedly clustered user_id"
    assert z_user <= 0.6, f"z-order failed to prune user_id ({z_user})"
    assert z_val <= 0.6, f"z-order failed to prune value ({z_val})"
    assert max(z_user, z_val) < lin_user

    # and the layout is only a reordering — same rows
    assert spark.read.parquet(zdir).count() == ev.count()


def test_interleave_bits_is_bijective(spark):
    """Morton interleave must be a bijection on the bucket grid —
    distinct (x, y) pairs map to distinct curve keys, so the curve
    sort never merges distinct cells (the pruning guarantee depends
    on it). Exhaustive over the full 64×64 grid."""
    from pyspark.sql import functions as F
    from mapreduce_rust_spark.sinks.layout import interleave_bits
    n = 64
    grid = (spark.range(n * n)
            .select((F.col("id") % n).alias("x"),
                    (F.col("id") / n).cast("long").alias("y")))
    z = grid.select(interleave_bits(F.col("x"), F.col("y"), 6).alias("z"))
    stats = z.agg(F.countDistinct("z").alias("d"),
                  F.min("z").alias("lo"), F.max("z").alias("hi")).first()
    assert stats.d == n * n           # injective
    assert stats.lo == 0 and stats.hi == n * n - 1  # onto [0, 4096)


def test_cli_zorder_roundtrip(spark, tmp_path):
    from mapreduce_rust_spark.cli import main
    from mapreduce_rust_spark.tables import load_table
    from tests.conftest import SF_CORRECT
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    load_table(spark, SF_CORRECT, "lineitem").limit(5000).write.parquet(src)
    rc = main(["zorder", "--src", src, "--dst", dst,
               "--col-x", "l_partkey", "--col-y", "l_extendedprice",
               "--n-files", "4"])
    assert rc == 0
    assert spark.read.parquet(dst).count() == 5000
