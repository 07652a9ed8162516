"""Chunked-smoothing semantics (SURVEY.md §7 hard part 2).

A conversation longer than MAX_UNCHUNKED_SLOTS is smoothed in fixed
epoch-aligned chunks with overlap+crop (engine_core.smooth_conv). These
tests pin the semantics: SG is BIT-exact vs the unchunked solve, the
chunked Whittaker deviates only near chunk boundaries within a tight
bound, all band_pipeline variants agree bit-exactly with each other, and
chunk boundaries are invariant to where the conversation starts."""

import numpy as np
import pytest

from sits_spark import engine_core, kernels


def _series(n, seed=0, gap_frac=0.2):
    rng = np.random.default_rng(seed)
    x = np.cumsum(rng.normal(0, 1.0, n)) + 50.0
    x[rng.random(n) < gap_frac] = np.nan
    x[0] = 42.0  # ensure an observed endpoint
    x[-1] = 43.0
    return x


def test_chunk_bounds_epoch_aligned():
    C = engine_core.CHUNK_SLOTS
    b = engine_core.chunk_bounds(lo_idx=C - 10, t=3 * C)
    # cuts at absolute multiples of C -> relative 10, C+10, 2C+10
    assert list(b) == [0, 10, C + 10, 2 * C + 10, 3 * C]


def test_short_conv_unchunked_bit_exact():
    # grid fully inside one chunk -> unchunked solve, bit-exact
    n = engine_core.CHUNK_SLOTS - 200
    filled = kernels.linear_interp_mtx(_series(n).reshape(1, -1))
    sg, whit = engine_core.smooth_conv(filled[0], lo_idx=100)
    want_sg = kernels.smooth_sg_mtx(filled)[0]
    want_whit = kernels.smooth_whit_mtx(filled)[0]
    assert np.array_equal(sg, want_sg)
    assert np.array_equal(whit, want_whit)


def test_long_conv_sg_bit_exact_whit_bounded():
    n = engine_core.CHUNK_SLOTS * 3 + 777
    filled = kernels.linear_interp_mtx(_series(n, seed=1).reshape(1, -1))
    sg, whit = engine_core.smooth_conv(filled[0], lo_idx=98765)
    # SG: FIR radius 2 << overlap 64 -> chunked result is bit-identical
    want_sg = kernels.smooth_sg_mtx(filled)[0]
    assert np.array_equal(sg, want_sg)
    # Whittaker: chunk-local solve deviates only near boundaries, tightly
    want_whit = kernels.smooth_whit_mtx(filled)[0]
    rel = np.abs(whit - want_whit) / (np.abs(want_whit) + 1e-9)
    assert rel.max() < 1e-6, rel.max()
    # interior of chunks is essentially exact
    assert np.median(rel) < 1e-12


def test_band_pipeline_variants_agree_on_long_conv():
    n = engine_core.CHUNK_SLOTS * 2 + 123
    lo_idx = 7_000_011
    alen = _series(n, seed=2)
    _f1, sg1, whit1 = engine_core.band_pipeline(alen.reshape(1, -1), lo_idx)
    f2, sg2, whit2, _fl = engine_core.band_pipeline_rows([alen.copy()], [lo_idx])
    gb = np.array([0, n], dtype=np.int64)
    f3, sg3, whit3, _fl3 = engine_core.band_pipeline_flat(
        alen.copy(), gb, np.array([lo_idx])
    )
    assert np.array_equal(sg1[0], sg2[0]) and np.array_equal(sg1[0], sg3)
    assert np.array_equal(whit1[0], whit2[0]) and np.array_equal(whit1[0], whit3)


def test_chunk_grid_is_absolute_not_conv_relative():
    """Two convs with identical values but different absolute starts must
    cut at the same ABSOLUTE slots (deterministic under resume/split)."""
    C = engine_core.CHUNK_SLOTS
    n = 2 * C
    b1 = engine_core.chunk_bounds(0, n)
    b2 = engine_core.chunk_bounds(C // 2, n)
    assert b1[1] == C and b2[1] == C - C // 2


def test_flat_batch_mixed_short_and_long():
    lens = [500, engine_core.CHUNK_SLOTS + 999, 7, 1200]
    rows = [_series(n, seed=i) for i, n in enumerate(lens)]
    gb = np.concatenate([[0], np.cumsum(lens)])
    lo = np.array([10, 20_000, 99, 4])
    flat = np.concatenate(rows)
    f, sg, whit, fl = engine_core.band_pipeline_flat(flat.copy(), gb, lo)
    for i, r in enumerate(rows):
        _f1, sg1, whit1 = engine_core.band_pipeline(r.reshape(1, -1), int(lo[i]))
        a, b = gb[i], gb[i + 1]
        assert np.array_equal(sg[a:b], sg1[0]), i
        assert np.array_equal(whit[a:b], whit1[0]), i


def test_pipeline_bytematch_with_chunked_conv(spark, tmp_path_factory):
    """Full Spark pipeline vs oracle on data containing a conversation
    long enough to take the chunked path — exercises the lo_idx plumbing
    through observed_slots -> mapInArrow -> tiers on both sides."""
    import pandas as pd
    from sits_spark import fixtures, oracle
    from sits_spark.pipeline import RollupPipeline

    # ~25k turns, ~70 s mean gap -> grid span comfortably > MAX_UNCHUNKED
    pdf = fixtures.gen_transcripts(40, seed=9, hot_turns=25_000)
    golden = oracle.full_pipeline(pdf)
    span = golden["tier_1m"].groupby("conv_id").size().max()
    assert span > engine_core.CHUNK_SLOTS, "fixture must cross a chunk boundary"

    inp = str(tmp_path_factory.mktemp("ch_in") / "t")
    spark.createDataFrame(pdf).write.parquet(inp)
    wh = str(tmp_path_factory.mktemp("ch_wh"))
    pipe = RollupPipeline(spark, wh)
    pipe.run(inp, run_id="ch1")

    got = pipe.read_tier("tier_1m").toPandas()
    want = golden["tier_1m"]
    got = got.sort_values(["conv_id", "slot_start"]).reset_index(drop=True)
    want = want.sort_values(["conv_id", "slot_start"]).reset_index(drop=True)
    assert len(got) == len(want)
    for c in ("alen_sg", "alen_whit", "alen_filled"):
        a = got[c].to_numpy()
        b = want[c].to_numpy()
        assert np.array_equal(a.view(np.uint64), b.view(np.uint64)), c


def test_cross_task_chunk_split_byte_identical(spark, tmp_path_factory):
    """tier_1m_chunked distributes one conversation over many
    (conv, chunk) tasks with halo + anchor rows — and must be BYTE
    identical to the single-task kernel, including boundary-crossing
    convs, interior multi-chunk gaps, and band-empty convs."""
    import pandas as pd
    from sits_spark import fixtures
    from sits_spark.operators import chunk_split, regularize

    pdf = fixtures.gen_transcripts(50, seed=13, hot_turns=30_000)
    # add a conv with a >2-chunk interior silent gap (stub-chunk path)
    import numpy as np_
    base = np_.datetime64("2025-01-01T00:00:00", "s")
    gap_rows = []
    for j, off in enumerate([0, 120, 240, engine_core.CHUNK_SLOTS * 3 * 60 + 60]):
        gap_rows.append(("conv-big-gap", j, "assistant", f"gap turn {j} xx", None,
                         base + np_.timedelta64(off, "s")))
    gap = pd.DataFrame(gap_rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    gap["turn_idx"] = gap["turn_idx"].astype("int32")
    pdf = pd.concat([pdf, gap], ignore_index=True)

    inp = str(tmp_path_factory.mktemp("cs_in") / "t")
    spark.createDataFrame(pdf).write.parquet(inp)
    raw = spark.read.parquet(inp)

    want = regularize.tier_1m(raw).orderBy("conv_id", "slot_start").toPandas()
    got = chunk_split.tier_1m_chunked(raw).orderBy("conv_id", "slot_start").toPandas()
    assert len(got) == len(want)
    assert list(got.columns) == list(want.columns)
    for c in want.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype == np.float64:
            assert np.array_equal(a.view(np.uint64), b.view(np.uint64)), c
        else:
            assert np.array_equal(a, b), c
