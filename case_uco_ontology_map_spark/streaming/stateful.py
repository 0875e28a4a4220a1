"""Custom stateful streaming operator: in-stream exact dedup.

applyInPandasWithState keyed by fingerprint bucket: per group, state holds
the set of fingerprints already emitted; replays/duplicates within the
stream are dropped. This is the streaming twin of ST1 exact resume — the
batch manifest becomes operator state with a processing-time TTL.

Scale notes: the state key is pmod(xxhash64(fingerprint), buckets) so state
is spread uniformly (no hot key); per-group state is a bounded dict of hex
strings; timeouts evict idle buckets.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "fingerprint string, record_uuid string, bucket int"
STATE_SCHEMA = "seen array<string>"


def _make_dedup_fn(ttl_ms: int):
    def _dedup_fn(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=["fingerprint", "record_uuid", "bucket"])
            return
        seen = set(state.get[0]) if state.exists else set()
        out = []
        for pdf in pdfs:
            for fp, ru in zip(pdf["fingerprint"], pdf["record_uuid"]):
                if fp not in seen:
                    seen.add(fp)
                    out.append((fp, ru, key[0]))
        state.update((list(seen),))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(out, columns=["fingerprint", "record_uuid", "bucket"])

    return _dedup_fn


def stream_dedup_manifest(
    manifest_stream: DataFrame, buckets: int = 64, ttl_ms: int = 0
) -> DataFrame:
    """(fingerprint, record_uuid) stream → first-occurrence-only stream.
    Exactly-once emission of each fingerprint across micro-batches via
    keyed operator state.

    ttl_ms > 0 evicts idle buckets with a processing-time timeout — the
    production memory-bound knob. NOTE: with a processing-time timeout the
    engine keeps scheduling batches to fire timeouts, so
    ``processAllAvailable()`` never settles — synchronous tests/drivers must
    use ttl_ms=0 (NoTimeout) and bound state by restarting from the manifest
    instead."""
    keyed = manifest_stream.withColumn(
        "bucket", F.pmod(F.xxhash64("fingerprint"), F.lit(buckets)).cast("int")
    )
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _make_dedup_fn(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
