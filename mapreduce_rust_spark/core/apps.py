"""Built-in MapReduce applications — the reference ships exactly one
(word count, ``/root/reference/src/app/wc.rs``); this registry is the
real pluggable surface the reference only gestures at (its app is
hard-wired: worker.rs imports ``crate::app::wc`` directly,
worker.rs:5,148,175).
"""

from __future__ import annotations

import re
from collections.abc import Iterable

# wc.rs:7 — strip [^\w\s]; Python's re \w is unicode-aware, so pin
# ASCII to match the Rust regex crate default and Spark's Java regex.
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


APPS = {
    "wc": (wc_map, wc_reduce),
    "wc_combined": (wc_map, wc_reduce_sum),
}
