"""Custom stateful streaming operators (applyInPandasWithState).

Two cross-batch semantics built-in streaming aggs cannot express:

  stream_dedup_manifest  in-stream exact dedup — per group, state holds
                         the set of fingerprints already emitted;
                         replays/duplicates within the stream are dropped.
                         The streaming twin of ST1 exact resume: the batch
                         manifest becomes operator state with a
                         processing-time TTL.
  threshold_alerts       fire EXACTLY ONCE per key when a cross-batch
                         running total crosses a threshold (an update-mode
                         agg re-emits on every change; an append-mode agg
                         only emits on watermark close). Training-pipeline
                         uses: crawl-budget cutoffs, dup-flood tripwires,
                         per-licence quota tracking.

Scale notes: dedup state is keyed by pmod(xxhash64(fingerprint), buckets)
so state spreads uniformly (no hot key) and timeouts evict idle buckets;
alert state is one small struct per KEY — memory scales with distinct
keys, not rows. Arrow batches per group, no per-row Python; the state
store checkpoints with the query (exactly-once on restart).
"""

from __future__ import annotations

from typing import Iterator, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

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


_ALERT_STATE_SCHEMA = StructType(
    [
        StructField("total", DoubleType()),
        StructField("n", LongType()),
        StructField("fired", LongType()),
    ]
)


def threshold_alerts(
    events: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    threshold: float,
) -> DataFrame:
    """Emit ONE row per key, in the micro-batch where that key's running
    sum of `value_col` first reaches `threshold`. The running sum
    accumulates across micro-batches via the state store; keys that never
    cross emit nothing; keys that already fired stay silent forever.

    Output: (*key_cols, total, n_events) — CUMULATIVE sum/count as of the
    crossing batch."""
    key_cols = list(key_cols)
    out_schema = StructType(
        [
            *[StructField(c, events.schema[c].dataType) for c in key_cols],
            StructField("total", DoubleType()),
            StructField("n_events", LongType()),
        ]
    )

    def fn(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        total, n, fired = state.get if state.exists else (0.0, 0, 0)
        for pdf in pdfs:
            total += float(pdf[value_col].astype(float).sum())
            n += len(pdf)
        crossed = (not fired) and total >= threshold
        state.update((total, n, 1 if (fired or crossed) else 0))
        if crossed:
            yield pd.DataFrame(
                [[*key, total, n]],
                columns=[*key_cols, "total", "n_events"],
            )

    return events.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_ALERT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
