"""Distributed-vs-oracle byte-match: the correctness gate (BASELINE.md).

The Spark pipeline must reproduce the single-node oracle bit-for-bit at
every tier, per-turn text must round-trip byte-exactly under stable
(conv_id, turn_idx) order, the salted Catalyst aggregation path must equal
the UDF path, and a killed-after-tier run must resume from manifests to a
byte-identical result."""

import os

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from sits_spark import fixtures, oracle
from sits_spark import manifest as mf
from sits_spark.operators import regularize, rollup
from sits_spark.pipeline import RollupPipeline

N_CONVS = 120
SEED = 42


@pytest.fixture(scope="module")
def raw_pdf():
    return fixtures.gen_transcripts(N_CONVS, seed=SEED, hot_turns=1500)


@pytest.fixture(scope="module")
def golden(raw_pdf):
    return oracle.full_pipeline(raw_pdf)


@pytest.fixture(scope="module")
def input_path(spark, raw_pdf, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("input") / "transcripts")
    spark.createDataFrame(raw_pdf).write.parquet(path)
    return path


@pytest.fixture(scope="module")
def warehouse(spark, input_path, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh") / "tiers")
    pipe = RollupPipeline(spark, wh)
    pipe.run(input_path, run_id="run-1")
    return wh


def assert_frames_bitexact(got: pd.DataFrame, want: pd.DataFrame, keys: list[str]):
    got = got.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in want.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype == np.float64:
            # bitwise equality, NaN == NaN
            assert np.array_equal(a.view(np.uint64), b.view(np.uint64)), c
        else:
            assert np.array_equal(a, b), c


def _spark_tier(spark, warehouse, tier):
    return RollupPipeline(spark, warehouse).read_tier(tier)


def test_text_roundtrip_byte_exact(spark, input_path, raw_pdf):
    back = (
        spark.read.parquet(input_path)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    want = raw_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert back["text"].tolist() == want["text"].tolist()
    assert back["conv_id"].tolist() == want["conv_id"].tolist()
    assert back["turn_idx"].tolist() == want["turn_idx"].tolist()


def test_tier_1m_bitexact(spark, warehouse, golden):
    got = _spark_tier(spark, warehouse, "tier_1m").toPandas()
    assert_frames_bitexact(got, golden["tier_1m"], ["conv_id", "slot_start"])


def test_agg_tiers_bitexact(spark, warehouse, golden):
    for tier in ("1h", "1d"):
        got = (
            _spark_tier(spark, warehouse, "agg")
            .where(F.col("tier") == tier)
            .drop("tier")
            .toPandas()
        )
        assert_frames_bitexact(got, golden[f"agg_{tier}"], ["conv_id", "window_start"])


def test_packed_bitexact(spark, warehouse, golden):
    got = _spark_tier(spark, warehouse, "packed_1h").toPandas()
    got["ts_d2"] = got["ts_d2"].apply(bytes)
    got["vals_gorilla"] = got["vals_gorilla"].apply(bytes)
    assert_frames_bitexact(got, golden["packed_1h"], ["conv_id", "window_start"])


def test_salted_catalyst_sums_equal_udf_path(spark, warehouse):
    t1m = _spark_tier(spark, warehouse, "tier_1m")
    for tier in ("1h", "1d"):
        catalyst = rollup.rollup_sums_catalyst(t1m, tier, salt_buckets=8).toPandas()
        udf = (
            _spark_tier(spark, warehouse, "agg")
            .where(F.col("tier") == tier)
            .select(catalyst.columns.tolist())
            .toPandas()
        )
        assert_frames_bitexact(
            catalyst, udf, ["conv_id", "window_start"]
        )


def test_resume_after_kill_is_byte_identical(spark, input_path, golden, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh2") / "tiers")
    pipe = RollupPipeline(spark, wh)

    # kill the job between checkpoint-group writes (FIXTURES.md §3.9):
    # group 1 commits its buckets, then the run dies before group 2's
    # commit — the manifest must carry exactly the completed buckets
    calls = {"n": 0}
    real_commit = pipe.store.commit

    def flaky_commit(rows, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected kill between checkpoint groups")
        real_commit(rows, **kw)

    pipe.store.commit = flaky_commit
    with pytest.raises(RuntimeError, match="injected kill"):
        pipe.run(input_path, run_id="run-1", checkpoint_groups=4)

    # resume: committed buckets skipped, missing ones recomputed
    pipe2 = RollupPipeline(spark, wh)
    pipe2.run(input_path, run_id="run-2")
    man = spark.read.schema(mf.MANIFEST_SCHEMA).parquet(os.path.join(wh, "_manifest")).toPandas()
    live = man[man.row_count >= 0]  # drop pre-rewrite tombstones
    done_first = set(live[live.run_id == "run-1"]["bucket"])
    done_second = set(live[live.run_id == "run-2"]["bucket"])
    assert done_first == set(range(16))  # first of 4 groups over 64 buckets
    assert done_second == set(range(16, 64))
    for tier in ("tier_1m", "agg", "packed_1h"):
        assert set(live[live.tier == tier]["bucket"]) == set(range(64))
    # the killed group's tombstones exist (and were superseded by run-2)
    assert set(man[(man.row_count < 0) & (man.run_id == "run-1")]["bucket"]) >= set(
        range(16, 32)
    )

    got = _spark_tier(spark, wh, "agg").where(F.col("tier") == "1h").drop("tier").toPandas()
    assert_frames_bitexact(got, golden["agg_1h"], ["conv_id", "window_start"])
    got1m = _spark_tier(spark, wh, "tier_1m").toPandas()
    assert_frames_bitexact(got1m, golden["tier_1m"], ["conv_id", "slot_start"])

    # idempotent re-run: nothing recomputed
    pipe2.run(input_path, run_id="run-3")
    man2 = spark.read.schema(mf.MANIFEST_SCHEMA).parquet(os.path.join(wh, "_manifest")).toPandas()
    assert "run-3" not in set(man2["run_id"])


def test_observed_slots_plan_is_partial_agg(spark, input_path):
    # the slot aggregation must show map-side partial aggregation
    # (HashAggregate before the exchange) and a pruned scan schema
    plan = regularize.observed_slots(
        spark.read.parquet(input_path)
    )._sc is None if False else regularize.observed_slots(
        spark.read.parquet(input_path)
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "turn_idx" not in plan.split("ReadSchema")[-1]  # column pruned


def test_giant_conv_chunked_write_byte_identical(spark, input_path, golden, tmp_path_factory):
    """Production chunked path (VERDICT r2 #2): with the giant threshold
    forced to 0 chunks, EVERY multi-slot conversation routes through
    fused_write_chunked's per-(conv, chunk) units of work — the result
    must still byte-match the single-node oracle at all three tiers."""
    wh = str(tmp_path_factory.mktemp("whg") / "tiers")
    pipe = RollupPipeline(spark, wh, giant_span_chunks=0)
    pipe.run(input_path, run_id="run-g")

    got = _spark_tier(spark, wh, "tier_1m").toPandas()
    assert_frames_bitexact(got, golden["tier_1m"], ["conv_id", "slot_start"])
    for tier in ("1h", "1d"):
        want = golden[f"agg_{tier}"]
        got = (
            _spark_tier(spark, wh, "agg")
            .where(F.col("tier") == tier)
            .drop("tier")
            .select(want.columns.tolist())
            .toPandas()
        )
        assert_frames_bitexact(got, want, ["conv_id", "window_start"])
    gotp = _spark_tier(spark, wh, "packed_1h").toPandas()
    assert_frames_bitexact(
        gotp.sort_values(["conv_id", "window_start"]).reset_index(drop=True),
        golden["packed_1h"].sort_values(["conv_id", "window_start"]).reset_index(drop=True),
        ["conv_id", "window_start"],
    )
    # the giant-id table was materialized once for reuse
    assert any(d.startswith("_giants-") for d in os.listdir(wh))


def test_regularize_first_plan_is_one_pass_agg_no_window(spark):
    """min_by selection must compile to a one-pass aggregate with
    map-side partial aggregation (partial_min_by before the exchange)
    and NO window operator (VERDICT r2 #9). Spark plans struct-ordered
    min_by as a SortAggregate — the sort is on the grouping key within
    partitions; the win vs row_number is that the exchange carries one
    row per (key, day) per mapper instead of every event row."""
    from sits_spark.queries import ts_regularize_first

    plan = (
        ts_regularize_first(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_min_by" in plan
    assert "Window" not in plan


def test_giant_pass_filter_reaches_scan(spark, input_path, tmp_path_factory):
    """The giant pass's conv_id isin predicate must be PUSHED to the
    parquet scan (row-group pruning at 100 TB), not applied post-scan."""
    raw = spark.read.parquet(input_path)
    giant = raw.where(F.col("conv_id").isin(["conv-hot-1", "conv-hot-2"]))
    plan = regularize.observed_slots(giant)._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters")[-1][:200]
    assert "In(conv_id" in pushed, pushed


def test_giant_split_joins_above_isin_cap(spark, input_path, golden, tmp_path_factory):
    """Above GIANT_ISIN_MAX ids the split must switch from literal isin
    predicates (plan/codegen bloat at 100k literals) to a broadcast
    semi-/anti-join — and the output must stay byte-identical."""
    wh = str(tmp_path_factory.mktemp("whj") / "tiers")
    pipe = RollupPipeline(spark, wh, giant_span_chunks=0)
    pipe.GIANT_ISIN_MAX = 0  # force the join regime for every giant list
    raw = spark.read.parquet(input_path)
    giants = pipe._giant_convs(raw, mf.input_fingerprint(input_path))
    assert giants  # threshold 0 makes every multi-chunk conv a giant
    from sits_spark.operators import regularize as reg

    stats = pipe._split_stats(
        reg.observed_slots(raw), giants, ("1h", "1d"), with_pack=True
    )
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan and "LeftAnti" in plan
    assert "In(conv_id" not in plan
    pipe.run(input_path, run_id="run-j")
    got = _spark_tier(spark, wh, "tier_1m").toPandas()
    assert_frames_bitexact(got, golden["tier_1m"], ["conv_id", "slot_start"])


def test_multi_flush_write_byte_identical(spark, input_path, golden, tmp_path_factory):
    """Force the incremental writer through MANY flushes per task (tiny
    thresholds passed through the plan closure): the multi-file tier
    output must still byte-match the oracle — flush boundaries are
    invisible in the data."""
    import glob

    from sits_spark.operators import fused

    table = str(tmp_path_factory.mktemp("whf") / "tiers")
    obs = regularize.observed_slots(spark.read.parquet(input_path))
    stats = fused.fused_write(
        obs, table, ("1h", "1d"), flush_rows=1000, flush_bytes=1 << 16
    )
    assert stats.count() > 0  # the action IS the write
    got = (
        spark.read.parquet(os.path.join(table, "row_kind=slot"))
        .select(*fused.TIER_1M_COLS)
        .toPandas()
    )
    assert_frames_bitexact(got, golden["tier_1m"], ["conv_id", "slot_start"])
    files = glob.glob(os.path.join(table, "row_kind=slot", "**", "*.parquet"), recursive=True)
    flush_ids = {os.path.basename(f).split("-")[2] for f in files}
    assert len(flush_ids) > 1, flush_ids


def test_object_store_backend_rename_free(
    spark, input_path, golden, tmp_path_factory, monkeypatch
):
    """Full pipeline on the object-store backend with os.rename and
    shutil.rmtree forbidden (r3 verdict #8): generation-tagged files +
    manifest-only visibility flips must produce byte-identical tiers,
    keep stale generations invisible after a forced recompute, and let
    vacuum reclaim them."""
    import shutil as _sh

    from sits_spark.storage import ObjectStoreStorage

    def _no_rename(*a, **k):
        raise AssertionError("os.rename used on object-store backend")

    def _no_rmtree(*a, **k):
        raise AssertionError("shutil.rmtree used on object-store backend")

    monkeypatch.setattr(os, "rename", _no_rename)
    monkeypatch.setattr(os, "renames", _no_rename)
    monkeypatch.setattr(_sh, "rmtree", _no_rmtree)

    wh = str(tmp_path_factory.mktemp("whos") / "tiers")
    pipe = RollupPipeline(spark, wh, storage=ObjectStoreStorage())
    pipe.run(input_path, run_id="os-1")
    got = pipe.read_tier("tier_1m").toPandas()
    assert_frames_bitexact(got, golden["tier_1m"], ["conv_id", "slot_start"])

    # forced recompute writes a SECOND generation into the same bucket
    # dirs; the manifest serves only the new one — no delete, no rename
    pipe.run(input_path, run_id="os-2", resume=False)
    got2 = pipe.read_tier("tier_1m").toPandas()
    assert_frames_bitexact(got2, golden["tier_1m"], ["conv_id", "slot_start"])
    all_files = pipe.storage.list_files(pipe.tier_path("tier_1m"))
    live = pipe._live_files("tier_1m")
    assert len(all_files) > len(live)  # stale generation still on disk

    # vacuum reclaims exactly the stale generation; reads unchanged
    deleted = pipe.vacuum()
    assert deleted > 0
    assert sorted(pipe.storage.list_files(pipe.tier_path("tier_1m"))) == sorted(live)
    got3 = pipe.read_tier("tier_1m").toPandas()
    assert_frames_bitexact(got3, golden["tier_1m"], ["conv_id", "slot_start"])
