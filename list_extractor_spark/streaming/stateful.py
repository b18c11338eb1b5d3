"""Custom stateful streaming operators (applyInPandasWithState).

The engine-native incremental path for corpus maintenance: as new document
batches stream in, drop documents whose content hash was already seen in ANY
earlier micro-batch (streaming exact dedup — the stateful complement of
tda/dedup.exact_dedup), with per-key state kept by Spark's state store.

State key = text_hash; value = (first_doc_id, n_seen).  Output = one row per
incoming doc with a kept/duplicate verdict, so downstream triple extraction
only processes kept docs.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("text_hash", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kept", T.BooleanType(), False),
        T.StructField("first_doc_id", T.StringType(), False),
        T.StructField("n_seen", T.LongType(), False),
    ]
)

_STATE_SCHEMA = "first_doc_id string, n_seen long"


def _make_dedup_fn(ttl_ms: int | None):
    """Build the per-group state function; ``ttl_ms`` arms a processing-time
    timeout so idle hashes are evicted instead of growing the state store
    without bound on an infinite stream."""

    def _dedup_fn(
        key: Tuple[str, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL expiry: forget the hash (dedup no longer applies against
            # ancient content).  Called only in a batch where the key got no
            # data, so there are no verdicts to emit.
            state.remove()
            return
        text_hash = key[0]  # salted mode keys by (text_hash, shard)
        if state.exists:
            first_doc_id, n_seen = state.get
        else:
            first_doc_id, n_seen = None, 0
        out = {k.name: [] for k in DEDUP_OUTPUT_SCHEMA.fields}
        for pdf in pdfs:
            for doc_id in sorted(pdf["doc_id"]):
                n_seen += 1
                kept = first_doc_id is None
                if kept:
                    first_doc_id = doc_id
                out["text_hash"].append(text_hash)
                out["doc_id"].append(doc_id)
                out["kept"].append(kept)
                out["first_doc_id"].append(first_doc_id)
                out["n_seen"].append(n_seen)
        state.update((first_doc_id, n_seen))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)  # re-armed on every arrival
        yield pd.DataFrame(out)

    return _dedup_fn


def streaming_exact_dedup(
    docs_stream: DataFrame, salt: int = 1, ttl_ms: int | None = None
) -> DataFrame:
    """documents stream -> per-doc kept/duplicate verdicts with cross-batch
    state.  Hash computed JVM-side; state partitioned by hash.

    ``salt=1`` (default): exact global semantics — one state key per hash,
    per-doc ``n_seen`` is the global arrival rank.  A duplicate STORM (one
    viral document repeated millions of times per batch) then lands on a
    single state partition/task.

    ``salt>1``: the hot-key form — the state key becomes (text_hash, shard)
    with shard = xxhash64(doc_id) mod salt, spreading a storm across ``salt``
    tasks with O(1) state per shard.  Verdicts are then per-shard (kept /
    first_doc_id / n_seen within the shard; at most ``salt`` rows per hash
    are kept=true), and ``merge_salted_verdicts`` is the second-stage batch
    merge over the append sink that restores group-level truth.  A global
    per-doc sequential rank is exactly what sharding removes — pipelines that
    need it must run unsalted.

    ``ttl_ms=None`` (default): state lives forever — exact global semantics,
    but the state store grows monotonically on an unbounded stream.
    ``ttl_ms=N``: per-key processing-time TTL — a hash idle for N ms is
    evicted (GroupStateTimeout.ProcessingTimeTimeout) and a later re-arrival
    is admitted as new.  The TTL re-arms on every arrival, so only hashes
    that stop recurring expire: an explicit "stop deduping against ancient
    content" retention knob.  Spark checks timeouts per micro-batch for keys
    WITHOUT data in that batch, so a duplicate arriving in the very batch
    that would have expired its key is still deduped — eviction is
    at-earliest-TTL, never mid-batch.

    Trigger caveat (measured on Spark 4.1): with ``ttl_ms`` set, do NOT run
    the query with ``Trigger.AvailableNow`` — processing-time timeouts make
    the engine schedule no-data cleanup batches indefinitely (
    ``lastExecutionRequiresAnotherBatch``), so the query never terminates,
    and for the same reason ``processAllAvailable()`` never observes a
    "no new data" trigger and blocks forever.  Use a ``processingTime``
    trigger, track progress via the sink (or ``lastProgress``), and stop
    explicitly; the TTL is for long-lived streams anyway (run-to-completion
    jobs don't need eviction)."""
    hashed = docs_stream.select(
        F.md5(F.concat_ws("\x00", F.transform("spans", lambda s: s["text"]))).alias(
            "text_hash"
        ),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    if salt > 1:
        hashed = hashed.withColumn(
            "shard", F.pmod(F.xxhash64("doc_id"), F.lit(salt)).cast("int")
        )
        keyed = hashed.groupBy("text_hash", "shard")
    else:
        keyed = hashed.groupBy("text_hash")
    return keyed.applyInPandasWithState(
        _make_dedup_fn(ttl_ms),
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms
            else GroupStateTimeout.NoTimeout
        ),
    )


def merge_salted_verdicts(verdicts: DataFrame) -> DataFrame:
    """Second-stage merge for ``salt>1`` output (batch pass over the sink):
    per-hash totals — deterministic representative (min of the shard firsts)
    and the exact duplicate count (every incoming doc emitted exactly one
    verdict row regardless of sharding)."""
    return verdicts.groupBy("text_hash").agg(
        F.min("first_doc_id").alias("first_doc_id"),
        F.count("*").alias("n_docs"),
    )
