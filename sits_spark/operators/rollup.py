"""Spark tier rollups: 1m -> 1h/1d continuous aggregates + packed blocks.

The direct descendant of the reference's temporal reduction
(/root/reference/R/sits_reduce.R:128-203, src/reduce_fns.cpp) re-expressed
for Spark with two interchangeable paths:

- ``rollup_tiers``: grouped pandas UDF per conv computing BOTH tiers in one
  pass over the (already dense) 1m grid via the shared numpy core — exact
  integer sums plus float stats in canonical slot order, guaranteeing
  byte-equality with the oracle. One shuffle for both tiers.
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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import engine_core

ROLLUP_SCHEMA = (
    "conv_id string, tier string, window_start timestamp, n_slots long, "
    "n_turns long, tokens_user long, tokens_assistant long, tokens_tool long, "
    "tool_calls long, turn_rate double, tool_call_rate double, "
    "alen_mean double, alen_min double, alen_max double, "
    "alen_median double, alen_std double"
)

PACK_SCHEMA = (
    "conv_id string, window_start timestamp, n int, first_ts long, "
    "first_val double, ts_d2 binary, vals_gorilla binary"
)

_GRID_INT_COLS = ("n_turns", "tokens_user", "tokens_assistant", "tokens_tool", "tool_calls")


def _grid_arrays(pdf: pd.DataFrame) -> dict[str, np.ndarray]:
    pdf = pdf.sort_values("slot_start")
    grid = {c: pdf[c].to_numpy(np.int64) for c in _GRID_INT_COLS}
    grid["slot_start_s"] = (
        pdf["slot_start"].to_numpy().astype("datetime64[s]").astype(np.int64)
    )
    grid["alen_whit"] = pdf["alen_whit"].to_numpy(np.float64)
    return grid


def _rollup_one(tiers: tuple[str, ...]):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        grid = _grid_arrays(pdf)
        frames = []
        for tier in tiers:
            out = engine_core.rollup_conv(grid, engine_core.TIER_SECONDS[tier])
            df = pd.DataFrame(out)
            df.insert(0, "tier", tier)
            df.insert(0, "conv_id", pdf["conv_id"].iloc[0])
            frames.append(df)
        res = pd.concat(frames, ignore_index=True)
        res["window_start"] = (
            res.pop("window_start_s").to_numpy().astype("datetime64[s]").astype("datetime64[us]")
        )
        cols = ["conv_id", "tier", "window_start"] + [
            c for c in engine_core.ROLLUP_COLS if c != "window_start_s"
        ]
        return res[cols]

    return fn


def rollup_tiers(t1m: DataFrame, tiers: tuple[str, ...] = ("1h", "1d")) -> DataFrame:
    """All requested tiers in ONE grouped pass; filter on ``tier`` after."""
    return t1m.groupBy("conv_id").applyInPandas(_rollup_one(tiers), ROLLUP_SCHEMA)


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


def _pack_one(pdf: pd.DataFrame) -> pd.DataFrame:
    grid = _grid_arrays(pdf)
    rows = engine_core.pack_conv(grid, 3600)
    out = pd.DataFrame(
        rows, columns=["window_start_s", "n", "first_ts", "first_val", "ts_d2", "vals_gorilla"]
    )
    out.insert(0, "conv_id", pdf["conv_id"].iloc[0])
    out["window_start"] = (
        out.pop("window_start_s").to_numpy().astype("datetime64[s]").astype("datetime64[us]")
    )
    out["n"] = out["n"].astype(np.int32)
    return out[["conv_id", "window_start", "n", "first_ts", "first_val", "ts_d2", "vals_gorilla"]]


def pack_blocks(t1m: DataFrame) -> DataFrame:
    """Gorilla-packed (conv, 1h) blocks of the smoothed band."""
    return t1m.groupBy("conv_id").applyInPandas(_pack_one, PACK_SCHEMA)
