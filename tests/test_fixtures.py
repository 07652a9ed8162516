"""Generator determinism + structure tests (FIXTURES.md §1/§3)."""

import numpy as np

from sits_spark import fixtures


def test_deterministic_across_calls():
    a = fixtures.gen_transcripts(40, seed=42, hot_turns=100)
    b = fixtures.gen_transcripts(40, seed=42, hot_turns=100)
    assert a.equals(b)


def test_seed_changes_content():
    a = fixtures.gen_transcripts(40, seed=1, hot_turns=100)
    b = fixtures.gen_transcripts(40, seed=2, hot_turns=100)
    assert not a.equals(b)


def test_schema_and_order():
    df = fixtures.gen_transcripts(20, seed=42, hot_turns=50)
    assert list(df.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert df["turn_idx"].dtype == np.int32
    g = df.groupby("conv_id")["turn_idx"]
    assert (g.min() == 0).all()
    # contiguous turn indices per conv (stable ordering key)
    assert (g.max() + 1 == g.count()).all()


def test_edge_convs_present():
    df = fixtures.gen_transcripts(20, seed=42, hot_turns=50)
    names = set(df["conv_id"])
    for c in (
        "conv-gap-interior", "conv-gap-leading", "conv-gap-trailing",
        "conv-all-empty", "conv-single-turn", "conv-dup-window",
        "conv-unicode-text", "conv-boundary-ts", "conv-hot-1",
    ):
        assert c in names, c


def test_tool_only_on_tool_role():
    df = fixtures.gen_transcripts(30, seed=42, hot_turns=50)
    gen = df[df.conv_id.str.startswith("conv-0")]
    assert (gen.loc[gen.role == "tool", "tool"].notna()).all()
    assert (gen.loc[gen.role != "tool", "tool"].isna()).all()


def test_hot_convs_are_hot():
    df = fixtures.gen_transcripts(50, seed=42, hot_turns=1000)
    counts = df.groupby("conv_id").size()
    assert counts["conv-hot-1"] == 1000
    assert counts["conv-hot-2"] == 500
    assert counts["conv-hot-3"] == 250
    assert counts.drop(["conv-hot-1", "conv-hot-2", "conv-hot-3"]).max() <= 200


def test_turns_scale_multiplies(tmp_path):
    n = fixtures.write_transcripts_parquet(
        str(tmp_path / "t"), n_convs=100, seed=7, hot_turns=10, turns_scale=3,
        chunk_convs=50,
    )
    n1 = fixtures.write_transcripts_parquet(
        str(tmp_path / "t1"), n_convs=100, seed=7, hot_turns=10, turns_scale=1,
        chunk_convs=50,
    )
    # edge convs + hot convs are fixed; the generated body scales ~3x
    assert n > 2.2 * n1
