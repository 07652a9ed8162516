"""Structured Streaming ingestion: transcript stream -> observed 1m slots.

The reference is batch-only (SURVEY.md §2.9); its closest analogs are the
period-window bucketing (/root/reference/R/api_period.R:57-86) and the
late/missing-data handling via gap slots
(/root/reference/R/api_regularize.R:91-103). The streaming front-end
mirrors the batch ``observed_slots`` aggregation exactly — same exact-int
measures per (conv_id, minute window) — with an event-time watermark for
late turns, appending to the SAME observed-slot layout the batch pipeline
consumes. Gap-fill/smoothing stay batch jobs over closed windows (the
smoothers need whole series; watermark-free because the grid join
materializes missing slots — SURVEY.md §2.9 mapping).

Sinks append to parquet bucketed the same way as the batch tiers, so a
periodic batch "compaction" run (the normal RollupPipeline over the
accumulated raw) produces byte-identical tiers — asserted in tests by
comparing a stream-ingested observed table against the batch aggregation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .manifest import bucket_expr


_SLOT_MEASURES = (
    "n_turns",
    "tokens_user",
    "tokens_assistant",
    "tokens_tool",
    "tool_calls",
    "alen_sum",
    "alen_n",
)


def _slots_agg_windowed(stream: DataFrame, watermark: str) -> DataFrame:
    """The 1-minute windowed exact-int slot aggregation with the event-
    time window column KEPT (``w``) so further event-time aggregations
    can chain on it (Spark's multiple-stateful-operator support)."""
    text_len = F.coalesce(F.length("text").cast("long"), F.lit(0))
    tok = F.floor(text_len / 4).cast("long")
    is_role = lambda r: F.col("role") == r  # noqa: E731
    ts = F.col("ts").cast("timestamp")
    return (
        stream.withColumn("ts", ts)
        .withWatermark("ts", watermark)
        .groupBy("conv_id", F.window("ts", "1 minute").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.when(is_role("user"), tok).otherwise(0)).alias("tokens_user"),
            F.sum(F.when(is_role("assistant"), tok).otherwise(0)).alias("tokens_assistant"),
            F.sum(F.when(is_role("tool"), tok).otherwise(0)).alias("tokens_tool"),
            F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0)).alias("tool_calls"),
            F.sum(F.when(is_role("assistant"), text_len).otherwise(0)).alias("alen_sum"),
            F.sum(F.when(is_role("assistant"), 1).otherwise(0)).alias("alen_n"),
        )
    )


def observed_slots_stream(
    stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming variant of operators.regularize.observed_slots.

    Same exact-int measures; ``F.window(ts, "1 minute")`` is the
    event-time tumbling window (half-open [start, end) — identical slot
    semantics to the batch floor-to-minute)."""
    return _slots_agg_windowed(stream, watermark).select(
        "conv_id",
        F.col("w.start").cast("long").alias("slot_s"),
        *_SLOT_MEASURES,
    )


def rollup_1h_stream(
    stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming continuous-aggregate CASCADE raw -> 1m -> 1h: two
    chained event-time window aggregations in ONE streaming query
    (Spark >= 3.5 multiple-stateful-operators; ``window_time`` carries
    event time from the closed 1m window into the 1h tumbling window).
    This is the streaming form of the batch tier cascade (§2.9 /
    engine_core agg tiers): per (conv_id, hour) the exact-int measures
    summed over observed minutes plus ``n_slots`` (count of observed 1m
    slots — the quantity the batch cascade derives from the 1m tier).
    Late data is handled once, at the first aggregation's watermark; the
    1h window only emits when every 1m window inside it has closed."""
    slots = _slots_agg_windowed(stream, watermark)
    return (
        slots.groupBy(
            "conv_id", F.window(F.window_time("w"), "1 hour").alias("hw")
        )
        .agg(
            F.count(F.lit(1)).alias("n_slots"),
            *[F.sum(m).alias(m) for m in _SLOT_MEASURES],
        )
        .select(
            "conv_id",
            F.col("hw.start").cast("long").alias("hour_s"),
            "n_slots",
            *_SLOT_MEASURES,
        )
    )


def detect_change_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    mu_stable: float,
    sd_stable: float,
    mu_changed: float,
    sd_changed: float,
    bwf: tuple[float, float] = (0.1, 0.9),
    tau: float = 2.0,
    order_by: tuple[str, ...] | None = None,
) -> DataFrame:
    """Streaming bayts change detection — the custom STATEFUL operator
    (SURVEY.md §2.9 ``applyInPandasWithState`` row; batch semantics in
    api.detect_change, reference src/bayts_fns.cpp:44-164).

    Per key, the group state carries the cumulative log-odds and the
    first flagged timestamp; each micro-batch sorts its rows by event
    time, continues the cumulative sum from state, and emits the key's
    updated (cum_llr, flagged, first_flag_ts). With in-order delivery
    per key this matches the batch operator's first-flag up to last-ulp
    exp/log differences between numpy and the JVM (the same class of
    divergence ts_bayts_change quantizes away; a cum sitting within
    ~1e-15 of tau could flip) — agreement asserted stream-vs-batch on
    clamped inputs in tests."""
    lo, hi = bwf
    # mirror the batch operator's FULL ordering tuple (api.detect_change
    # orders by e.g. (ts, event_id)): sorting on ts alone lets rows with
    # equal timestamps accumulate log-odds in a different order and flag
    # a different first row than batch
    sort_cols = list(order_by) if order_by else [ts_col]
    out_schema = (
        f"{key_col} string, cum_llr double, flagged boolean, first_flag_ts long"
    )
    state_schema = "cum double, flagged boolean, first long"

    def fn(key, pdfs, state: GroupState):
        cum, flagged, first = (
            state.get if state.exists else (0.0, False, None)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(sort_cols, kind="mergesort")
        v = rows[value_col].to_numpy(dtype=np.float64)
        ts = rows[ts_col].to_numpy(dtype=np.int64)

        def phi(mu, sd):
            return np.exp(-((v - mu) ** 2) / (2.0 * sd * sd)) / (
                sd * np.sqrt(2.0 * np.pi)
            )

        pc, ps = phi(mu_changed, sd_changed), phi(mu_stable, sd_stable)
        den = pc + ps
        # far outliers underflow both densities: 0/0 would be NaN, which
        # np.clip passes through and which poisons the group state
        # forever — decide by the nearer mean instead
        zc = ((v - mu_changed) / sd_changed) ** 2
        zs = ((v - mu_stable) / sd_stable) ** 2
        with np.errstate(invalid="ignore", divide="ignore"):
            p = np.where(den > 0, pc / np.where(den > 0, den, 1.0),
                         np.where(zc <= zs, 1.0, 0.0))
        p = np.clip(p, lo, hi)
        cums = cum + np.cumsum(np.log(p / (1.0 - p)))
        cum = float(cums[-1]) if len(cums) else cum
        if not flagged:
            hit = np.flatnonzero(cums >= tau)
            if len(hit):
                flagged = True
                first = int(ts[hit[0]])
        state.update((cum, bool(flagged), first))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "cum_llr": [cum],
                "flagged": [bool(flagged)],
                "first_flag_ts": [first],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def start_observed_sink(
    stream_slots: DataFrame,
    out_path: str,
    checkpoint: str,
    trigger_seconds: int = 30,
):
    """Append observed slots to the warehouse layout (bucketed parquet)
    with exactly-once file commits via the streaming checkpoint."""
    out = stream_slots.withColumn("bucket", bucket_expr())
    return (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("bucket")
        .outputMode("append")
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
