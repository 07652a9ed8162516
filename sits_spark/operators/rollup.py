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
            grid = _grid_arrays(tbl)
            starts, bounds = conv_bounds(cid)
            out: dict[str, list[np.ndarray]] = {k: [] for k in engine_core.ROLLUP_COLS}
            piece_conv: list = []
            piece_tier: list[str] = []
            piece_len: list[int] = []
            for i in range(len(starts)):
                sl = slice(bounds[i], bounds[i + 1])
                conv_grid = {k: v[sl] for k, v in grid.items()}
                for tier in tiers:
                    res = engine_core.rollup_conv(
                        conv_grid, engine_core.TIER_SECONDS[tier]
                    )
                    for k in engine_core.ROLLUP_COLS:
                        out[k].append(res[k])
                    piece_conv.append(cid[starts[i]])
                    piece_tier.append(tier)
                    piece_len.append(len(res["window_start_s"]))
            lens = np.array(piece_len, dtype=np.int64)
            data = {
                "conv_id": np.repeat(np.array(piece_conv, dtype=object), lens),
                "tier": np.repeat(np.array(piece_tier, dtype=object), lens),
                "window_start": np.concatenate(out["window_start_s"]) * 1_000_000,
            }
            for k in engine_core.ROLLUP_COLS:
                if k != "window_start_s":
                    data[k] = np.concatenate(out[k])
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
        grid = _grid_arrays(tbl)
        starts, bounds = conv_bounds(cid)
        conv_col: list = []
        win: list[int] = []
        n: list[int] = []
        first_ts: list[int] = []
        first_val: list[float] = []
        ts_d2: list[bytes] = []
        vals_g: list[bytes] = []
        for i in range(len(starts)):
            sl = slice(bounds[i], bounds[i + 1])
            conv_grid = {
                "slot_start_s": grid["slot_start_s"][sl],
                "alen_whit": grid["alen_whit"][sl],
            }
            for r in engine_core.pack_conv(conv_grid, 3600):
                conv_col.append(cid[starts[i]])
                win.append(r[0] * 1_000_000)
                n.append(r[1])
                first_ts.append(r[2])
                first_val.append(r[3])
                ts_d2.append(r[4])
                vals_g.append(r[5])
        data = {
            "conv_id": conv_col,
            "window_start": np.array(win, dtype=np.int64),
            "n": np.array(n, dtype=np.int32),
            "first_ts": np.array(first_ts, dtype=np.int64),
            "first_val": np.array(first_val, dtype=np.float64),
            "ts_d2": ts_d2,
            "vals_gorilla": vals_g,
        }
        yield record_batch(data, _PACK_PA)


def pack_blocks(
    t1m: DataFrame, partitions: int | None = None, pre_clustered: bool = False
) -> DataFrame:
    """Gorilla-packed (conv, 1h) blocks of the smoothed band."""
    return _cluster(t1m, partitions, pre_clustered).mapInArrow(_pack_iter, PACK_SCHEMA)
