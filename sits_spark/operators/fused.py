"""Fused single-pass tier computation: observed slots -> {1m grid, 1h/1d
aggregates, packed blocks} in ONE mapInArrow stage.

At 10^12-turn scale the dominant cost is touching the series data; once a
conversation's grid is materialized in memory, the rollup and packing of
that same grid are marginal. This operator therefore emits a UNION-schema
stream (``row_kind`` in {slot, agg, pack}) from a single conv-batched
pass; the pipeline caches the (much smaller) union output and derives each
tier with a pure filter + projection before its write. This replaces three
kernel passes over the 1m tier with one — the Spark analog of the
reference computing every requested band in one chunk traversal
(/root/reference/R/api_apply.R:114-138 block loop).

Per-conv math is identical to operators.regularize/rollup (shared
engine_core kernels), so byte-exactness vs the oracle is unchanged —
asserted in tests/test_spark_pipeline.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import engine_core
from ..batching import arrow_conv_batches, conv_bounds, record_batch, schema_of
from .regularize import _INT_COLS, _OBS_COLS, TIER_1M_SCHEMA
from .rollup import PACK_SCHEMA, ROLLUP_SCHEMA

FUSED_SCHEMA = (
    "row_kind string, conv_id string, slot_start timestamp, present boolean, "
    "n_turns long, tokens_user long, tokens_assistant long, tokens_tool long, "
    "tool_calls long, alen double, fill_flag string, alen_filled double, "
    "alen_sg double, alen_whit double, "
    "tier string, window_start timestamp, n_slots long, "
    "turn_rate double, tool_call_rate double, alen_mean double, "
    "alen_min double, alen_max double, alen_median double, alen_std double, "
    "n int, first_ts long, first_val double, ts_d2 binary, vals_gorilla binary, "
    "bucket int, day date"
)
_FUSED_PA = schema_of(FUSED_SCHEMA)

TIER_1M_COLS = [f.split(" ")[0] for f in TIER_1M_SCHEMA.split(", ")]
ROLLUP_COLS = [f.split(" ")[0] for f in ROLLUP_SCHEMA.split(", ")]
PACK_COLS = [f.split(" ")[0] for f in PACK_SCHEMA.split(", ")]


def _fused_iter(tiers: tuple[str, ...], with_pack: bool = True):
    def fn(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for tbl in arrow_conv_batches(it):
            cid = tbl["conv_id"]
            slot = tbl["slot_s"]
            bkt = tbl["bucket"]
            starts, bounds = conv_bounds(cid)
            n_convs = len(starts)

            # --- grids + ragged band pipeline over the whole batch ---
            grids: list[dict[str, np.ndarray]] = []
            for i in range(n_convs):
                sl = slice(bounds[i], bounds[i + 1])
                grids.append(
                    engine_core.scatter_grid(
                        slot[sl], *[tbl[c][sl] for c in _OBS_COLS]
                    )
                )
            filled, sg, whit, flags = engine_core.band_pipeline_rows(
                [g["alen"] for g in grids]
            )
            for i in range(n_convs):
                grids[i]["fill_flag"] = flags[i]
                grids[i]["alen_filled"] = filled[i]
                grids[i]["alen_sg"] = sg[i]
                grids[i]["alen_whit"] = whit[i]

            # --- slot rows ---
            lens = np.array([len(g["slot_start_s"]) for g in grids], dtype=np.int64)
            n_slot_rows = int(lens.sum())
            slot_s_all = np.concatenate([g["slot_start_s"] for g in grids])
            slot_data: dict[str, np.ndarray] = {
                "row_kind": np.full(n_slot_rows, "slot", dtype=object),
                "conv_id": np.repeat(cid[starts], lens),
                "slot_start": slot_s_all * 1_000_000,
                "bucket": np.repeat(bkt[starts], lens),
                "day": (slot_s_all // 86400).astype(np.int32),
            }
            for k in _INT_COLS:
                slot_data[k] = np.concatenate([g[k] for g in grids])
            for k in ("alen", "fill_flag", "alen_filled", "alen_sg", "alen_whit"):
                slot_data[k] = np.concatenate([g[k] for g in grids])
            yield record_batch(slot_data, _FUSED_PA, n_slot_rows)

            # --- agg rows (all tiers) + pack rows from the in-hand grids ---
            agg_out: dict[str, list[np.ndarray]] = {
                k: [] for k in engine_core.ROLLUP_COLS
            }
            agg_conv: list = []
            agg_bkt: list[int] = []
            agg_tier: list[str] = []
            agg_len: list[int] = []
            pk_conv: list = []
            pk_bkt: list[int] = []
            pk_rows: list[tuple] = []
            for i in range(n_convs):
                g = grids[i]
                conv_grid = {
                    "slot_start_s": g["slot_start_s"],
                    "alen_whit": g["alen_whit"],
                }
                for k in ("n_turns", "tokens_user", "tokens_assistant", "tokens_tool", "tool_calls"):
                    conv_grid[k] = g[k]
                for tier in tiers:
                    res = engine_core.rollup_conv(
                        conv_grid, engine_core.TIER_SECONDS[tier]
                    )
                    for k in engine_core.ROLLUP_COLS:
                        agg_out[k].append(res[k])
                    agg_conv.append(cid[starts[i]])
                    agg_bkt.append(bkt[starts[i]])
                    agg_tier.append(tier)
                    agg_len.append(len(res["window_start_s"]))
                if with_pack:
                    for r in engine_core.pack_conv(conv_grid, 3600):
                        pk_conv.append(cid[starts[i]])
                        pk_bkt.append(bkt[starts[i]])
                        pk_rows.append(r)

            alens = np.array(agg_len, dtype=np.int64)
            n_agg = int(alens.sum())
            agg_win = np.concatenate(agg_out["window_start_s"])
            agg_data = {
                "row_kind": np.full(n_agg, "agg", dtype=object),
                "conv_id": np.repeat(np.array(agg_conv, dtype=object), alens),
                "bucket": np.repeat(np.array(agg_bkt, dtype=np.int32), alens),
                "tier": np.repeat(np.array(agg_tier, dtype=object), alens),
                "window_start": agg_win * 1_000_000,
                "day": (agg_win // 86400).astype(np.int32),
            }
            for k in engine_core.ROLLUP_COLS:
                if k != "window_start_s":
                    agg_data[k] = np.concatenate(agg_out[k])
            yield record_batch(agg_data, _FUSED_PA, n_agg)

            if with_pack:
                n_pk = len(pk_rows)
                pk_win = np.array([r[0] for r in pk_rows], dtype=np.int64)
                pack_data = {
                    "row_kind": np.full(n_pk, "pack", dtype=object),
                    "conv_id": pk_conv,
                    "bucket": np.array(pk_bkt, dtype=np.int32),
                    "window_start": pk_win * 1_000_000,
                    "day": (pk_win // 86400).astype(np.int32),
                    "n": np.array([r[1] for r in pk_rows], dtype=np.int32),
                    "first_ts": np.array([r[2] for r in pk_rows], dtype=np.int64),
                    "first_val": np.array([r[3] for r in pk_rows], dtype=np.float64),
                    "ts_d2": [r[4] for r in pk_rows],
                    "vals_gorilla": [r[5] for r in pk_rows],
                }
                yield record_batch(pack_data, _FUSED_PA, n_pk)

    return fn


def fused_tiers(
    observed: DataFrame,
    tiers: tuple[str, ...] = ("1h", "1d"),
    partitions: int | None = None,
    with_pack: bool = True,
) -> DataFrame:
    """Observed 1-minute slots -> union-schema stream of all tiers.

    Clusters by (bucket, conv_id) ranges — a conversation stays whole
    inside one task, and each task's output lands in at most a couple of
    bucket directories, so the downstream partitioned write needs NO
    repartition exchange (the kernel emits the write's partition columns
    ``bucket``/``day`` directly)."""
    from .. import manifest as mf

    n = partitions or int(
        observed.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    clustered = (
        observed.withColumn("bucket", mf.bucket_expr())
        .repartitionByRange(n, "bucket", "conv_id")
        .sortWithinPartitions("bucket", "conv_id", "slot_s")
    )
    return clustered.mapInArrow(_fused_iter(tiers, with_pack), FUSED_SCHEMA)


def slot_tier(fused: DataFrame) -> DataFrame:
    return fused.where(F.col("row_kind") == "slot").select(*TIER_1M_COLS)


def agg_tier(fused: DataFrame) -> DataFrame:
    return fused.where(F.col("row_kind") == "agg").select(*ROLLUP_COLS)


def pack_tier(fused: DataFrame) -> DataFrame:
    return fused.where(F.col("row_kind") == "pack").select(*PACK_COLS)
