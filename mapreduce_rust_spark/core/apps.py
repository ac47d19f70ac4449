"""Built-in MapReduce applications — the reference ships exactly one
(word count, ``/root/reference/src/app/wc.rs``); this registry is the
real pluggable surface the reference only gestures at (its app is
hard-wired: worker.rs imports ``crate::app::wc`` directly,
worker.rs:5,148,175).
"""

from __future__ import annotations

import re
from collections.abc import Iterable

# wc.rs:7 — strip [^\w\s]. DOCUMENTED DIVERGENCE: the reference's
# regex crate (1.9, default features) has Unicode-aware \w, so it
# keeps 'café' intact; we pin ASCII so Python-side apps, Spark's Java
# regex, and the DuckDB oracles all agree ('café' → 'caf'). Parity is
# exact on ASCII corpora (the reference's own Gutenberg fixture) and
# intentionally ASCII-normalized beyond that.
_PUNCT = re.compile(r"[^\w\s]", re.ASCII)
_WS = re.compile(r"\s+")


def wc_map(split: str) -> Iterable[tuple[str, str]]:
    """wc.rs:6-13 — strip punctuation, whitespace-split, emit
    ``(word, "1")`` per occurrence. Case-sensitive."""
    for tok in _WS.split(_PUNCT.sub("", split)):
        if tok:
            yield tok, "1"


def wc_reduce(key: str, values: list[str]) -> str:
    """wc.rs:15-17 — COUNT(*) per key (``values.len()``), stringly."""
    return str(len(values))


def wc_combine(key: str, values: list[str]) -> str:
    """Map-side partial count: emits the partition-local SUM so the
    shuffle carries one record per (partition, word). Pairs with
    ``wc_reduce_sum`` on the reduce side."""
    return str(sum(int(v) for v in values))


def wc_reduce_sum(key: str, values: list[str]) -> str:
    """Reduce for combined runs: values are partial counts, so SUM
    (plain ``len`` would be wrong after combining)."""
    return str(sum(int(v) for v in values))


def sess_map(line: str) -> Iterable[tuple[str, str]]:
    """Sessionization mapper for ``run_job_secondary_sort``: each
    split is one ``user_id,epoch_seconds`` record; emit as-is."""
    user, epoch = line.split(",", 1)
    yield user, epoch


def sess_sort_key(value: str) -> int:
    """Numeric secondary-sort key (string order would misorder epochs
    of different digit counts)."""
    return int(value)


def sess_reduce(key: str, values: list[str]) -> str:
    """Gap-based session counter over epochs ALREADY sorted by the
    shuffle (secondary sort) — single pass, O(1) state, no in-memory
    sort of a possibly-giant value list. Emits 'n_sessions,n_events'.
    """
    n_sessions, prev = 0, None
    for v in values:
        s = int(v)
        if prev is None or s - prev > 1800:
            n_sessions += 1
        prev = s
    return f"{n_sessions},{len(values)}"


APPS = {
    "wc": (wc_map, wc_reduce),
    "wc_combined": (wc_map, wc_reduce_sum),
    "sessionize": (sess_map, sess_reduce),
}
