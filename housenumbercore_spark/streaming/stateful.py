"""Custom stateful streaming operator: per-user running aggregates with
explicit GroupState (`applyInPandasWithState`).

This is the extension point for stateful semantics the built-in windowed/
session aggregations can't express (per-key model state, custom eviction,
cross-batch counters). State is a single narrow tuple per user; per batch,
each key's Arrow-batched rows fold into the state and the operator emits the
updated running totals.

Scale notes: state lives in the state store partitioned by the grouping key
(shuffle on user_id), so key cardinality — not event volume — bounds memory.
This operator runs with ``GroupStateTimeout.NoTimeout`` — running totals
are permanent by definition, and the availableNow drains the driver/bench
use are single-batch. A CONTINUOUS deployment whose keys churn should add
idle-key eviction: pass ``ProcessingTimeTimeout``, call
``state.setTimeoutDuration`` on every update, and branch on
``state.hasTimedOut`` to ``state.remove()`` (without re-updating, which
would re-arm the key) — the standard applyInPandasWithState eviction shape;
this module does not wire it because evicting a running total silently
zeroes it on the key's next event.
"""

from __future__ import annotations


import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
        T.StructField("first_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def _round_half_up(v):
    """SQL round() on doubles (Java BigDecimal HALF_UP of the double's
    exact value): nearest integer everywhere; ties — only possible at an
    exactly-representable .5 — away from zero. floor(abs(v)+0.5) looks
    equivalent but the +0.5 ADDITION rounds 1-ulp-below-.5 inputs (e.g.
    0.49999999999999994) up to 1.0, off by one vs SQL; np.rint's
    half-to-even is exact except at true halves, which the where()
    corrects."""
    import numpy as np

    r = np.rint(v)
    half = np.abs(v - np.trunc(v)) == 0.5
    return np.where(half, np.trunc(v) + np.sign(v), r)


def _update(key, pdfs, state: GroupState):
    n, cents, first_us, last_us = (
        state.get if state.exists else (0, 0, None, None)
    )
    import numpy as np

    for pdf in pdfs:
        n += len(pdf)
        # NULL values drop from the sum like SQL SUM (a NaN reaching
        # astype("int64") is platform-defined garbage)
        v = pdf["value"].to_numpy(dtype="float64") * 100
        v = v[~np.isnan(v)]
        cents += int(_round_half_up(v).astype("int64").sum())
        ts = pdf["ts"].dropna()  # NaT skips like SQL MIN/MAX
        if len(ts):
            ts_us = ts.astype("int64") // 1000  # ns → µs
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
    state.update((n, cents, first_us, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "value_cents": [cents],
            "first_ts": [pd.Timestamp(first_us, unit="us")],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def user_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the events backlog through the stateful operator and return
    the per-user running totals emitted for the final batch."""
    from .windows import drain_to_df, events_stream

    updated = events_stream(spark, sf_dir).groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return drain_to_df(updated, output_mode="update")


def user_running_stats_sql() -> str:
    """availableNow drains one batch, so the emitted state equals the batch
    aggregate — recomputable in plain SQL."""
    return """
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts
FROM events GROUP BY user_id"""
