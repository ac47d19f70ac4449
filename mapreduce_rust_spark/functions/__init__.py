"""Column-level function library (pure ``pyspark.sql.functions``
compositions — JVM-side, whole-stage-codegen'd; no Python UDFs)."""
