"""Custom stateful streaming operators via applyInPandasWithState.

The reference pipeline has NO stream state — every message commits
independently and late data is last-writer-wins by uuid-keyed upsert
(SURVEY.md §2.H; message_handler.go:69-135) — so `streaming/ingest.py`
covers its semantics with foreachBatch + MERGE. This module adds the
stateful operator a *training-data* pipeline needs on top of that:
streaming exact-dedup (emit each content fingerprint's FIRST occurrence,
suppress every later duplicate across microbatches), the canonical
"dedup before it reaches the training shard" stage run as a continuous
job instead of a batch sweep.

Scale notes (100 TB / continuous):
  * the groupBy(key) shuffles each microbatch by fingerprint once; state
    lives in the state store partition-local to that key (set
    `spark.sql.streaming.stateStore.providerClass` to RocksDB in prod so
    state size is disk-bound, not heap-bound).
  * state per key is a few bytes (first id + count), so billions of keys
    are state-store-feasible; eviction policy is the caller's choice of
    GroupStateTimeout (NoTimeout here — dedup state must not expire, a
    re-emitted duplicate would re-enter the training set).
  * the function is Arrow-batched per key-group (applyInPandasWithState),
    no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DEDUP_OUTPUT_SCHEMA = StructType(
    [
        StructField("content_sha", StringType()),
        StructField("doc_id", LongType()),        # the FIRST occurrence
        StructField("n_suppressed", LongType()),  # dups seen so far (this batch incl.)
    ]
)

# state = (first doc_id, duplicates suppressed so far)
DEDUP_STATE_SCHEMA = StructType(
    [
        StructField("first_doc_id", LongType()),
        StructField("n_suppressed", LongType()),
    ]
)


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-fingerprint state update: first row ever seen wins (ties inside
    one batch broken by lowest doc_id for determinism); everything else
    increments the suppressed count. Emits one row per batch in which the
    key appears: the canonical (sha, first_doc_id) plus the running
    suppressed count — so the sink always holds the latest dup tally."""
    sha = key[0]
    ids: list[int] = []
    for pdf in pdfs:
        ids.extend(int(x) for x in pdf["doc_id"])
    if state.exists:
        first, n_sup = state.get
        n_sup += len(ids)
    else:
        first = min(ids)
        n_sup = len(ids) - 1
    state.update((first, n_sup))
    yield pd.DataFrame(
        {
            "content_sha": [sha],
            "doc_id": pd.Series([first], dtype="int64"),
            "n_suppressed": pd.Series([n_sup], dtype="int64"),
        }
    )


def streaming_dedup_first_wins(stream: DataFrame,
                               text_col: str = "text",
                               id_col: str = "doc_id") -> DataFrame:
    """Streaming exact-dedup over a document stream: fingerprint with
    sha256 (JVM-side, same as dedup.exact_dup_groups), group by the
    fingerprint, and keep ONE canonical doc per fingerprint forever via
    per-key state. Output mode 'update': each batch re-emits the keys it
    touched with their current (first_doc_id, n_suppressed)."""
    keyed = stream.select(
        F.sha2(F.encode(F.col(text_col), "UTF-8"), 256).alias("content_sha"),
        F.col(id_col).cast("long").alias("doc_id"),
    )
    return keyed.groupBy("content_sha").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
