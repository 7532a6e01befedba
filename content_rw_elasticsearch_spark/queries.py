"""The reference query set (FIXTURES.md §2 coverage matrix).

Analog of the reference's golden test tables
(/root/reference/pkg/mapper/mapper_test.go:86-115 pins named input→expected
pairs); here each named query pins (query text, mode, k) and is checked
rank-identical against the DuckDB oracle by the driver and against the
pure-Python oracle by tests.

Coverage (per FIXTURES.md §2): single rare term; single hot term; 2-term
AND with skewed selectivities; AND with an absent term (empty result); OR
union; all-hot-terms AND (worst case for WAND pruning).
"""

from __future__ import annotations

REFERENCE_QUERIES: dict[str, dict] = {
    "single_rare": {"query": "dup", "mode": "AND", "k": 10},
    "single_hot": {"query": "join", "mode": "AND", "k": 10},
    "and_two": {"query": "hash join", "mode": "AND", "k": 10},
    "and_skewed": {"query": "dup join", "mode": "AND", "k": 10},
    "and_empty": {"query": "zzzabsent hash join", "mode": "AND", "k": 10},
    "or_three": {"query": "vector batch scan", "mode": "OR", "k": 10},
    "and_allhot": {"query": "join hash row scan small", "mode": "AND", "k": 10},
    "or_large_k": {"query": "merge sort window", "mode": "OR", "k": 50},
}
