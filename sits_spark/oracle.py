"""Single-node reference implementation (the byte-match oracle).

Defines the engine's exact semantics over the transcript table and computes
them with pandas/numpy only, via the shared per-conv core in
``sits_spark.engine_core``. The Spark pipeline
(``sits_spark.pipeline``) must reproduce every value byte-exactly — this
mirrors the reference's test pattern of comparing operator output against
direct kernel recomputation
(/root/reference/tests/testthat/test-reduce.R:27-33), hardened to exact
equality per BASELINE.md.

Pipeline stages (the sits regularize -> impute -> smooth -> reduce chain,
/root/reference/R/sits_regularize.R, R/sits_imputation.R, R/sits_filters.R,
R/sits_reduce.R):

1. **1-minute grid** per conv over [floor_min(ts), floor_max(ts)], half-open
   slots ``[start, start+60s)``, empty slots materialized
   (/root/reference/R/api_regularize.R:54-112).
2. **Observed slot metrics** as exact int64: turn counts, per-role token
   sums (token proxy len(text)//4), tool-call counts, assistant text-length
   sums/counts. ``alen`` = mean assistant text length per slot (NULL where
   no assistant turn) is the gap-fill band.
3. **Gap fill**: interior linear / leading backfill / trailing LOCF /
   all-NULL stays NULL (/root/reference/src/linear_interp.cpp:25-73).
4. **Smoothing**: Savitzky-Golay (order 3, length 5) + Whittaker (0.5)
   (/root/reference/src/smooth_sgp.cpp:37-59, src/smooth_whit.cpp:20-64).
5. **Tier aggregates** agg_1h/agg_1d (/root/reference/src/reduce_fns.cpp).
6. **Packed blocks**: Gorilla XOR + delta-of-delta per (conv, 1h).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import engine_core


def observed_1m(conv_df: pd.DataFrame) -> dict[str, np.ndarray]:
    """Observed (sparse) 1-minute slot metrics of ONE conv as int64 arrays,
    slot-sorted. Token proxy = len(text)//4 (FIXTURES.md §1)."""
    ts = conv_df["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
    slot = (ts // 60) * 60
    lo = slot.min()
    idx = (slot - lo) // 60
    t = int(idx.max()) + 1

    text_len = conv_df["text"].str.len().fillna(0).to_numpy().astype(np.int64)
    tokens = text_len // 4
    role = conv_df["role"].to_numpy()
    is_tool_call = conv_df["tool"].notna().to_numpy().astype(np.int64)

    def cnt(weights=None):
        return np.bincount(idx, weights, minlength=t).astype(np.int64)

    n_turns = cnt()
    observed = n_turns > 0
    out = {
        "slot_s": (lo + 60 * np.arange(t, dtype=np.int64))[observed],
        "n_turns": n_turns[observed],
        "tokens_user": cnt(tokens * (role == "user"))[observed],
        "tokens_assistant": cnt(tokens * (role == "assistant"))[observed],
        "tokens_tool": cnt(tokens * (role == "tool"))[observed],
        "tool_calls": cnt(is_tool_call)[observed],
        "alen_sum": cnt(text_len * (role == "assistant"))[observed],
        "alen_n": cnt((role == "assistant").astype(np.int64))[observed],
    }
    return out


def _grid_frame(conv_id: str, grid: dict[str, np.ndarray]) -> pd.DataFrame:
    df = pd.DataFrame(grid)
    df.insert(0, "conv_id", conv_id)
    df["slot_start"] = (
        df.pop("slot_start_s").to_numpy().astype("datetime64[s]").astype("datetime64[us]")
    )
    cols = ["conv_id", "slot_start"] + [
        c for c in engine_core.GRID_COLS if c != "slot_start_s"
    ]
    return df[cols]


def tier_1m(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Full 1-minute tier, canonical order (conv_id, slot_start)."""
    parts = []
    for conv_id, g in transcripts.groupby("conv_id", sort=True):
        obs = observed_1m(g)
        grid = engine_core.observed_to_grid(
            obs["slot_s"],
            obs["n_turns"],
            obs["tokens_user"],
            obs["tokens_assistant"],
            obs["tokens_tool"],
            obs["tool_calls"],
            obs["alen_sum"],
            obs["alen_n"],
        )
        parts.append(_grid_frame(conv_id, grid))
    return pd.concat(parts, ignore_index=True)


def rollup(t1m: pd.DataFrame, tier: str) -> pd.DataFrame:
    """Aggregate the 1m tier into 1h/1d continuous aggregates."""
    sec = engine_core.TIER_SECONDS[tier]
    parts = []
    for conv_id, g in t1m.groupby("conv_id", sort=True):
        grid = {
            c: g[c].to_numpy()
            for c in ("n_turns", "tokens_user", "tokens_assistant", "tokens_tool", "tool_calls", "alen_whit")
        }
        grid["slot_start_s"] = (
            g["slot_start"].to_numpy().astype("datetime64[s]").astype(np.int64)
        )
        out = engine_core.rollup_conv(grid, sec)
        df = pd.DataFrame(out)
        df.insert(0, "conv_id", conv_id)
        parts.append(df)
    res = pd.concat(parts, ignore_index=True)
    res["window_start"] = (
        res.pop("window_start_s").to_numpy().astype("datetime64[s]").astype("datetime64[us]")
    )
    cols = ["conv_id", "window_start"] + [c for c in engine_core.ROLLUP_COLS if c != "window_start_s"]
    return res[cols]


def pack_1h(t1m: pd.DataFrame) -> pd.DataFrame:
    """Gorilla-pack the smoothed 1m band per (conv, 1h window)."""
    frames = []
    for conv_id, g in t1m.groupby("conv_id", sort=True):
        grid = {
            "slot_start_s": g["slot_start"].to_numpy().astype("datetime64[s]").astype(np.int64),
            "alen_whit": g["alen_whit"].to_numpy(),
        }
        cols = engine_core.pack_conv(grid, 3600)
        df = pd.DataFrame(cols)
        df.insert(0, "conv_id", conv_id)
        frames.append(df)
    out = pd.concat(frames, ignore_index=True)
    out["window_start"] = (
        out.pop("window_start_s").to_numpy().astype("datetime64[s]").astype("datetime64[us]")
    )
    out["n"] = out["n"].astype(np.int32)
    out["first_ts"] = out["first_ts"].astype(np.int64)
    return out[["conv_id", "window_start", "n", "first_ts", "first_val", "ts_d2", "vals_gorilla"]]


def full_pipeline(transcripts: pd.DataFrame) -> dict[str, pd.DataFrame]:
    """raw -> 1m -> {agg_1h, agg_1d, packed_1h}."""
    t1m = tier_1m(transcripts)
    return {
        "tier_1m": t1m,
        "agg_1h": rollup(t1m, "1h"),
        "agg_1d": rollup(t1m, "1d"),
        "packed_1h": pack_1h(t1m),
    }
