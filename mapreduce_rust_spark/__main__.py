"""``python -m mapreduce_rust_spark`` — the CLI entry point the
README and ``cli.py`` docstring advertise (tests exercise ``cli.main``
in-process; this shim is what a user actually types)."""

from __future__ import annotations

import sys

from mapreduce_rust_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
