"""The generic MapReduce programming contract — the reference's
user-facing API (``/root/reference/src/mr/worker.rs:16-25``) on
Spark's native machinery."""

from mapreduce_rust_spark.core.runner import KV_SCHEMA, run_job, run_job_df

__all__ = ["run_job", "run_job_df", "KV_SCHEMA"]
