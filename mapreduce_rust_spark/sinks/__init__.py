"""Sinks — including the reference-framing text sink compat layer."""

from mapreduce_rust_spark.sinks.textsink import write_bucketed, write_kv_text

__all__ = ["write_kv_text", "write_bucketed"]
