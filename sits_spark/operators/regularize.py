"""Spark regularization stage: raw transcript turns -> dense 1-minute tier.

Two sub-stages, mirroring the reference's regularize -> impute -> smooth
chain (/root/reference/R/sits_regularize.R:170-246,
R/api_regularize.R:54-112, R/sits_imputation.R, R/sits_filters.R) as
idiomatic Spark:

1. ``observed_slots``: Catalyst-native groupBy over (conv_id, minute slot).
   Every measure is an exact int64 (counts / integer sums), so Spark's
   map-side partial aggregation is order-insensitive and bit-stable — the
   distributed result equals the oracle's bincounts exactly. This stage
   reads the raw table once; filters and column pruning push down to the
   parquet/Iceberg scan.
2. ``fill_smooth``: grouped pandas UDF (``applyInPandas``) per conv_id
   that materializes the full minute grid (gap slots included), gap-fills
   the assistant-length band and applies Savitzky-Golay + Whittaker via
   the shared numpy core (sits_spark.engine_core). One conversation is one
   group — a series never splits, so no halo/overlap handling is needed
   (SURVEY.md §4 "overlap processing" row).

Scale note: the grouped UDF's unit of memory is one conversation's minute
grid (30-day conv = 43k slots ≈ 4 MB) — safe per-executor at 10^12-turn
scale because stage 1 already collapsed turns to slots.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import engine_core

TIER_1M_SCHEMA = (
    "conv_id string, slot_start timestamp, present boolean, n_turns long, "
    "tokens_user long, tokens_assistant long, tokens_tool long, "
    "tool_calls long, alen double, fill_flag string, alen_filled double, "
    "alen_sg double, alen_whit double"
)


def observed_slots(transcripts: DataFrame) -> DataFrame:
    """Aggregate raw turns into observed (sparse) 1-minute slots.

    Token proxy = length(text)//4; ``alen_*`` carries the assistant
    text-length sum/count whose ratio is the smoothing band.
    """
    text_len = F.coalesce(F.length("text").cast("long"), F.lit(0))
    tok = F.floor(text_len / 4).cast("long")
    is_role = lambda r: F.col("role") == r  # noqa: E731
    slot_s = (F.floor(F.col("ts").cast("long") / 60) * 60).alias("slot_s")
    return transcripts.groupBy("conv_id", slot_s).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.when(is_role("user"), tok).otherwise(0)).alias("tokens_user"),
        F.sum(F.when(is_role("assistant"), tok).otherwise(0)).alias("tokens_assistant"),
        F.sum(F.when(is_role("tool"), tok).otherwise(0)).alias("tokens_tool"),
        F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0)).alias("tool_calls"),
        F.sum(F.when(is_role("assistant"), text_len).otherwise(0)).alias("alen_sum"),
        F.sum(F.when(is_role("assistant"), 1).otherwise(0)).alias("alen_n"),
    )


def _fill_smooth_one(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("slot_s")
    grid = engine_core.observed_to_grid(
        pdf["slot_s"].to_numpy(np.int64),
        pdf["n_turns"].to_numpy(np.int64),
        pdf["tokens_user"].to_numpy(np.int64),
        pdf["tokens_assistant"].to_numpy(np.int64),
        pdf["tokens_tool"].to_numpy(np.int64),
        pdf["tool_calls"].to_numpy(np.int64),
        pdf["alen_sum"].to_numpy(np.int64),
        pdf["alen_n"].to_numpy(np.int64),
    )
    out = pd.DataFrame(grid)
    out.insert(0, "conv_id", pdf["conv_id"].iloc[0])
    out["slot_start"] = (
        out.pop("slot_start_s").to_numpy().astype("datetime64[s]").astype("datetime64[us]")
    )
    cols = ["conv_id", "slot_start"] + [c for c in engine_core.GRID_COLS if c != "slot_start_s"]
    return out[cols]


def fill_smooth(observed: DataFrame) -> DataFrame:
    """Dense, gap-filled, smoothed 1m tier (one grid row per minute slot)."""
    return observed.groupBy("conv_id").applyInPandas(_fill_smooth_one, TIER_1M_SCHEMA)


def tier_1m(transcripts: DataFrame) -> DataFrame:
    """raw turns -> dense smoothed 1-minute tier."""
    return fill_smooth(observed_slots(transcripts))
