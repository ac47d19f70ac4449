#!/usr/bin/env python
"""Capture .explain('formatted') for named queries into
plans/r12/<query>_<tag>.txt  (usage: capture_plans.py tag q1 q2 ...).

Streaming twins can't be explained before execution (the plan exists
per micro-batch); for them this records the POST-SINK batch plan the
query returns, which is where the closed form runs — the trigger-side
cost is recorded separately in OPTIMIZATION_r12.md via trigger_ms_sum.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")
from mapreduce_rust_spark import registry  # noqa: E402
from mapreduce_rust_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.dirname(os.path.abspath(__file__))

tag = sys.argv[1]
names = sys.argv[2:]
spark = get_spark("plan-capture")
qs = registry.queries()
for name in names:
    df = qs[name](spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(OUT, f"{name}_{tag}.txt"), "w") as fh:
        fh.write(buf.getvalue())
    print("captured", name, flush=True)
spark.stop()
