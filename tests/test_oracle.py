"""Oracle semantics tests over the named edge-case conversations
(FIXTURES.md §3) — structural/metamorphic properties in the style of
/root/reference/tests/testthat/test-filtering.R:1-18."""

import numpy as np
import pandas as pd

from sits_spark import fixtures, oracle


def _t1m():
    df = fixtures.gen_transcripts(30, seed=42, hot_turns=300)
    return df, oracle.tier_1m(df)


def test_grid_is_dense_regular_per_conv():
    _, t1m = _t1m()
    for conv, g in t1m.groupby("conv_id"):
        s = g["slot_start"].to_numpy().astype("datetime64[s]").astype(np.int64)
        assert (np.diff(s) == 60).all(), conv
        # grid spans exactly floor(min ts) .. floor(max ts)


def test_gap_interior_linear():
    _, t1m = _t1m()
    g = t1m[t1m.conv_id == "conv-gap-interior"].reset_index(drop=True)
    assert list(g["fill_flag"][3:6]) == ["linear"] * 3
    np.testing.assert_allclose(g["alen_filled"][3:6], [48.0, 60.0, 72.0])


def test_gap_leading_backfill_and_trailing_locf():
    _, t1m = _t1m()
    lead = t1m[t1m.conv_id == "conv-gap-leading"]
    assert list(lead["fill_flag"][:3]) == ["locf_lead"] * 3
    first_valid = lead.loc[lead["fill_flag"] == "obs", "alen"].iloc[0]
    np.testing.assert_array_equal(lead["alen_filled"][:3], [first_valid] * 3)
    trail = t1m[t1m.conv_id == "conv-gap-trailing"]
    assert list(trail["fill_flag"].iloc[-3:]) == ["locf_trail"] * 3
    last_valid = trail.loc[trail["fill_flag"] == "obs", "alen"].iloc[-1]
    np.testing.assert_array_equal(trail["alen_filled"].iloc[-3:], [last_valid] * 3)


def test_all_empty_conv_stays_null():
    _, t1m = _t1m()
    g = t1m[t1m.conv_id == "conv-all-empty"]
    assert (g["fill_flag"] == "empty").all()
    assert g["alen_filled"].isna().all()
    assert g["alen_whit"].isna().all()


def test_single_turn_passthrough():
    _, t1m = _t1m()
    g = t1m[t1m.conv_id == "conv-single-turn"]
    assert len(g) == 1
    assert g["alen_whit"].iloc[0] == g["alen"].iloc[0]
    assert g["alen_sg"].iloc[0] == g["alen"].iloc[0]


def test_dup_window_aggregates_into_one_slot():
    raw, t1m = _t1m()
    g = t1m[t1m.conv_id == "conv-dup-window"]
    assert len(g) == 1 and g["n_turns"].iloc[0] == 5
    texts = raw[raw.conv_id == "conv-dup-window"]["text"]
    assert g["alen"].iloc[0] == texts.str.len().sum() / 5


def test_boundary_ts_half_open_windows():
    _, t1m = _t1m()
    g = t1m[t1m.conv_id == "conv-boundary-ts"].reset_index(drop=True)
    # turns at :00:00, :01:00 and +1h land in their own slots, not previous
    assert bool(g["present"].iloc[0]) and bool(g["present"].iloc[1])
    assert bool(g["present"].iloc[60])
    assert len(g) == 61
    agg = oracle.rollup(t1m[t1m.conv_id == "conv-boundary-ts"], "1h")
    assert list(agg["n_turns"]) == [2, 1]  # hour 0 gets 2 turns, hour 1 gets 1


def test_rollup_sums_match_raw_counts():
    raw, t1m = _t1m()
    agg = oracle.rollup(t1m, "1d")
    assert agg["n_turns"].sum() == len(raw)
    tok = (raw["text"].str.len() // 4)
    assert (
        agg["tokens_user"].sum() + agg["tokens_assistant"].sum() + agg["tokens_tool"].sum()
        == tok.sum()
    )
    assert agg["tool_calls"].sum() == raw["tool"].notna().sum()


def test_cascade_1d_sums_equal_1h_sums():
    _, t1m = _t1m()
    a1h = oracle.rollup(t1m, "1h")
    a1d = oracle.rollup(t1m, "1d")
    for c in ("n_turns", "tokens_user", "tokens_assistant", "tokens_tool", "tool_calls", "n_slots"):
        assert a1h[c].sum() == a1d[c].sum(), c


def test_packed_roundtrip_bit_exact():
    from sits_spark import codec

    _, t1m = _t1m()
    packed = oracle.pack_1h(t1m)
    joined = 0
    for _, row in packed.iterrows():
        ts = codec.decode_ts_d2(row["ts_d2"])
        vals = codec.decode_xor(row["vals_gorilla"])
        g = t1m[(t1m.conv_id == row["conv_id"])]
        s = g["slot_start"].to_numpy().astype("datetime64[s]").astype(np.int64)
        mask = (s >= row["first_ts"]) & (s < row["first_ts"] + 3600)
        sel = (s // 3600 * 3600) == int(
            pd.Timestamp(row["window_start"]).timestamp()
        )
        np.testing.assert_array_equal(ts, s[sel])
        np.testing.assert_array_equal(
            vals.view(np.uint64), g["alen_whit"].to_numpy()[sel].view(np.uint64)
        )
        joined += 1
    assert joined == len(packed) > 0


def test_nnls_k3_is_true_optimum(spark):
    SF_DIR = "/root/testdata/sf0.01"
    """The KKT subset enumeration must return the genuine NNLS optimum:
    cross-check against an independent projected-gradient solve run to
    convergence, and assert the clamping branches are actually hit."""
    import duckdb as _dd
    import numpy as np

    from sits_spark import queries as q

    got = (
        q.emb_mixture_nnls_k3(spark, SF_DIR)
        .orderBy("vec_id")
        .toPandas()
    )
    emb = _dd.sql(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
    ).fetchnumpy()
    V = np.stack([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    E = np.stack([q._EM_A, q._EM_B, q._EM_C]).T  # 64 x 3
    A = E.T @ E
    L = np.linalg.eigvalsh(A).max()
    for i, vid in enumerate(emb["vec_id"][:100]):
        b = E.T @ V[i]
        x = np.zeros(3)
        for _ in range(20000):  # projected gradient, step 1/L
            x = np.maximum(0.0, x - (A @ x - b) / L)
        row = got[got.vec_id == vid].iloc[0]
        want = np.array([row.frac_a, row.frac_b, row.frac_c])
        assert np.allclose(want, x, atol=1e-4), (vid, want, x)
    fr = got[["frac_a", "frac_b", "frac_c"]].to_numpy()
    assert (fr == 0.0).any(axis=1).sum() > 0  # clamping exercised
    assert (fr > 0).all(axis=1).sum() > 0     # interior solutions too
