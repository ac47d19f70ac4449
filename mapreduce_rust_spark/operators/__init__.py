"""Relational / analytical operators, each a
``(spark, sf_dir) -> DataFrame`` callable wired into
``__spark_entry__.queries()`` with a DuckDB oracle."""
