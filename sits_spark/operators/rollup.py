"""Spark tier rollups: 1m -> 1h/1d continuous aggregates + packed blocks.

The direct descendant of the reference's temporal reduction
(/root/reference/R/sits_reduce.R:128-203, src/reduce_fns.cpp) re-expressed
for Spark with two interchangeable paths:

- ``rollup_tiers``: conv-batched ``mapInArrow`` (see sits_spark.batching)
  computing BOTH tiers in one pass over the (already dense) 1m grid via
  the shared numpy core — exact integer sums plus float stats in canonical
  slot order, guaranteeing byte-equality with the oracle. One shuffle for
  both tiers.
- ``rollup_sums_catalyst``: Catalyst-native two-phase *salted* aggregation
  of the integer measures — pre-aggregate on (conv_id, window, salt), then
  merge. Demonstrates the skew-safe plan shape the north rule requires for
  hot conversations (SURVEY.md §4 skew row); integer sums compose exactly,
  so it is byte-equal to the UDF path (asserted in tests).

``pack_blocks``: Gorilla XOR + delta-of-delta blobs per (conv, 1h window)
as BinaryType — the write-side analog of the reference packing scaled
INT2S bands (/root/reference/R/api_reduce.R:245-254).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import engine_core
from ..batching import arrow_conv_batches, conv_bounds, record_batch, schema_of

ROLLUP_SCHEMA = (
    "conv_id string, tier string, window_start timestamp, n_slots long, "
    "n_turns long, tokens_user long, tokens_assistant long, tokens_tool long, "
    "tool_calls long, turn_rate double, tool_call_rate double, "
    "alen_mean double, alen_min double, alen_max double, "
    "alen_median double, alen_std double"
)
_ROLLUP_PA = schema_of(ROLLUP_SCHEMA)

PACK_SCHEMA = (
    "conv_id string, window_start timestamp, n int, first_ts long, "
    "first_val double, ts_d2 binary, vals_gorilla binary"
)
_PACK_PA = schema_of(PACK_SCHEMA)

_GRID_INT_COLS = ("n_turns", "tokens_user", "tokens_assistant", "tokens_tool", "tool_calls")


def cluster_by_conv(t1m: DataFrame, partitions: int | None = None) -> DataFrame:
    """Range-partition by conv_id and sort within partitions — the input
    layout every conv-batched stage needs. Persist the result when several
    stages consume it (exchanges are not reused across separate actions)."""
    n = partitions or int(t1m.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return t1m.repartitionByRange(n, "conv_id").sortWithinPartitions(
        "conv_id", "slot_start"
    )


def _cluster(t1m: DataFrame, partitions: int | None, pre_clustered: bool = False) -> DataFrame:
    return t1m if pre_clustered else cluster_by_conv(t1m, partitions)


def _grid_arrays(tbl: dict[str, np.ndarray]):
    grid = {c: tbl[c] for c in _GRID_INT_COLS}
    # slot_start arrives as datetime64[us] (arrow timestamp) -> epoch seconds
    grid["slot_start_s"] = tbl["slot_start"].astype("datetime64[s]").astype(np.int64)
    grid["alen_whit"] = tbl["alen_whit"]
    return grid


def _rollup_iter(tiers: tuple[str, ...]):
    def fn(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for tbl in arrow_conv_batches(it):
            cid = tbl["conv_id"]
            flat = _grid_arrays(tbl)
            starts, bounds = conv_bounds(cid)
            conv_arr = cid[starts]
            parts = [
                (t, *engine_core.rollup_flat(flat, bounds, engine_core.TIER_SECONDS[t]))
                for t in tiers
            ]
            data = {
                "conv_id": np.concatenate([conv_arr[cw] for _t, _c, cw in parts]),
                "tier": np.concatenate(
                    [np.full(len(cw), t, dtype=object) for t, _c, cw in parts]
                ),
                "window_start": np.concatenate(
                    [c["window_start_s"] for _t, c, _w in parts]
                ) * 1_000_000,
            }
            for k in engine_core.ROLLUP_COLS:
                if k != "window_start_s":
                    data[k] = np.concatenate([c[k] for _t, c, _w in parts])
            yield record_batch(data, _ROLLUP_PA)

    return fn


def rollup_tiers(
    t1m: DataFrame,
    tiers: tuple[str, ...] = ("1h", "1d"),
    partitions: int | None = None,
    pre_clustered: bool = False,
) -> DataFrame:
    """All requested tiers in ONE conv-batched pass; filter on ``tier``."""
    return _cluster(t1m, partitions, pre_clustered).mapInArrow(
        _rollup_iter(tiers), ROLLUP_SCHEMA
    )


def rollup_sums_catalyst(t1m: DataFrame, tier: str, salt_buckets: int = 16) -> DataFrame:
    """Skew-safe Catalyst path for the integer measures of one tier.

    Two-phase: partial sums on (conv_id, window_start, salt) — the salt
    splits a hot conversation's window across ``salt_buckets`` reducers —
    then exact merge on (conv_id, window_start). Counts/sums compose, so
    this is byte-equal to the UDF path.
    """
    sec = engine_core.TIER_SECONDS[tier]
    win = (
        F.floor(F.col("slot_start").cast("long") / sec) * sec
    ).cast("timestamp").alias("window_start")
    salt = F.pmod(F.xxhash64("slot_start"), F.lit(salt_buckets)).alias("_salt")
    partial = t1m.groupBy("conv_id", win, salt).agg(
        F.count(F.lit(1)).alias("n_slots"),
        *[F.sum(c).alias(c) for c in _GRID_INT_COLS],
    )
    merged = partial.groupBy("conv_id", "window_start").agg(
        F.sum("n_slots").alias("n_slots"),
        *[F.sum(c).alias(c) for c in _GRID_INT_COLS],
    )
    return merged.select(
        "conv_id",
        "window_start",
        "n_slots",
        *_GRID_INT_COLS,
        (F.col("n_turns") / F.col("n_slots")).alias("turn_rate"),
        (F.col("tool_calls") / F.col("n_slots")).alias("tool_call_rate"),
    )


def _pack_iter(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for tbl in arrow_conv_batches(it):
        cid = tbl["conv_id"]
        flat = _grid_arrays(tbl)
        starts, bounds = conv_bounds(cid)
        cols, cw = engine_core.pack_flat(flat, bounds, 3600)
        data = {
            "conv_id": cid[starts][cw],
            "window_start": cols["window_start_s"] * 1_000_000,
            "n": cols["n"],
            "first_ts": cols["first_ts"],
            "first_val": cols["first_val"],
            "ts_d2": cols["ts_d2"],
            "vals_gorilla": cols["vals_gorilla"],
        }
        yield record_batch(data, _PACK_PA)


def pack_blocks(
    t1m: DataFrame, partitions: int | None = None, pre_clustered: bool = False
) -> DataFrame:
    """Gorilla-packed (conv, 1h) blocks of the smoothed band."""
    return _cluster(t1m, partitions, pre_clustered).mapInArrow(_pack_iter, PACK_SCHEMA)
