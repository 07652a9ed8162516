"""Deterministic synthetic transcript generator (FIXTURES.md §1/§3).

Produces the engine's input table
``(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp)`` as a pandas DataFrame — fully vectorized numpy so the bench
scale (~5e7 turns) generates in chunks at parquet speed. All randomness is
seeded; timestamps are fixed literals inside 2025-01-01..2025-01-30 UTC.

Mirrors the reference's fixture strategy of tiny deterministic inputs
checked against direct kernel recomputation
(/root/reference/inst/extdata/raster/mod13q1, tests/testthat/test-reduce.R:27-33):
conv lengths are Zipf-skewed (hot heads exercise salting), inter-turn gaps
are exponential (median ~20 s) with injected burst gaps so 1-minute grid
slots go empty, and a fixed set of named edge-case conversations encodes
every gap-fill / smoothing / ordering corner (FIXTURES.md §3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

EPOCH_START = np.datetime64("2025-01-01T00:00:00", "s")
WINDOW_SECONDS = 29 * 24 * 3600  # conv starts within 2025-01-01..2025-01-30

ROLES = np.array(["user", "assistant", "tool"])
TOOLS = np.array(["search", "exec", "browse", "fetch"])

_WORDS = np.array(
    "the data spark query scan join filter group window agg shuffle stream "
    "table row batch merge sort hash key value index plan node stage task "
    "turn conversation agent tool call response token model answer question "
    "schnell blau 世界 データ 分析 モデル σύστημα ανάλυση".split()
)


def _make_text_pool(rng: np.random.Generator, pool_size: int = 4096) -> np.ndarray:
    """Deterministic pool of pseudo-texts with lognormal lengths; turns pick
    from it by seeded index (byte-exact reproducible, cheap at 5e7 rows)."""
    lengths = np.clip(rng.lognormal(2.2, 0.8, pool_size), 1, 200).astype(np.int64)
    texts = []
    for n in lengths:
        idx = rng.integers(0, len(_WORDS), n)
        texts.append(" ".join(_WORDS[idx]))
    return np.array(texts, dtype=object)


def _assemble(
    conv_ids: np.ndarray,
    n_turns: np.ndarray,
    rng: np.random.Generator,
    text_pool: np.ndarray,
) -> pd.DataFrame:
    """Vectorized turn assembly for a batch of conversations."""
    total = int(n_turns.sum())
    conv_col = np.repeat(conv_ids, n_turns)
    # turn_idx: 0..n-1 within each conv
    ends = np.cumsum(n_turns)
    starts = ends - n_turns
    turn_idx = (np.arange(total) - np.repeat(starts, n_turns)).astype(np.int32)
    # inter-turn gaps: exponential median ~20 s, plus seeded bursts
    # (~3% of gaps stretched x50) so minute-grid slots go empty
    gaps = np.maximum(1, rng.exponential(20.0 / np.log(2.0), total)).astype(np.int64)
    bursts = rng.random(total) < 0.03
    gaps = np.where(bursts, gaps * 50, gaps)
    gaps[starts] = 0
    conv_start = rng.integers(0, WINDOW_SECONDS, len(conv_ids))
    offs = np.cumsum(gaps)
    offs = offs - np.repeat(offs[starts], n_turns)
    ts = np.repeat(conv_start, n_turns) + offs
    # roles cycle with seeded variation; tool turns carry a tool name
    role_idx = (turn_idx + rng.integers(0, 3, total)) % 3
    role = ROLES[role_idx]
    tool = np.where(
        role == "tool", TOOLS[rng.integers(0, len(TOOLS), total)], None
    )
    text = text_pool[rng.integers(0, len(text_pool), total)]
    return pd.DataFrame(
        {
            "conv_id": conv_col,
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": EPOCH_START + ts.astype("timedelta64[s]"),
        }
    )


def _edge_convs() -> pd.DataFrame:
    """Named edge-case conversations (FIXTURES.md §3), fixed literals."""
    rows: list[tuple[str, int, str, str, str | None, int]] = []
    base = 10 * 24 * 3600  # 2025-01-11 00:00:00

    def add(conv, idx, role, text, tool, sec):
        rows.append((conv, idx, role, text, tool, sec))

    # 1. interior gap: assistant turns at minutes 0,1,2 then 6,7 (slots 3-5 empty)
    i = 0
    for m in (0, 1, 2, 6, 7):
        add("conv-gap-interior", i, "user", "ask " * 3, None, base + m * 60 + 5)
        i += 1
        add("conv-gap-interior", i, "assistant", "answer body " * (m + 1), None, base + m * 60 + 30)
        i += 1
    # 2. leading gap: user-only for 3 minutes, then assistant
    i = 0
    for m in range(6):
        add("conv-gap-leading", i, "user", "lead user text", None, base + m * 60 + 10)
        i += 1
        if m >= 3:
            add("conv-gap-leading", i, "assistant", "late answer " * (m - 2), None, base + m * 60 + 40)
            i += 1
    # 2b. trailing gap: assistant early, user-only at the end
    i = 0
    for m in range(6):
        add("conv-gap-trailing", i, "user", "trail user text", None, base + m * 60 + 10)
        i += 1
        if m < 3:
            add("conv-gap-trailing", i, "assistant", "early answer " * (m + 1), None, base + m * 60 + 40)
            i += 1
    # 3. all-empty: no assistant turns at all -> metric series stays NULL
    for m in range(4):
        add("conv-all-empty", m, "user", "only user here", None, base + m * 60 + 20)
    # 4. single turn: series shorter than SG window -> passthrough path
    add("conv-single-turn", 0, "assistant", "solo", None, base + 7)
    # 6. duplicate window: several turns inside one minute slot
    for j in range(5):
        add("conv-dup-window", j, "assistant", f"dup {j} " * (j + 1), None, base + 10 + j)
    # 7. unicode: multi-byte text must round-trip byte-exact
    uni = ["こんにちは 世界 🌍", "naïve café — übergroß", "Ωμέγα λόγος", "emoji 🚀🔥"]
    for j, t in enumerate(uni):
        add("conv-unicode-text", j, "assistant" if j % 2 else "user", t, None, base + 60 * j + 3)
    # 8. boundary ts: turns exactly on minute/hour boundaries (half-open windows)
    add("conv-boundary-ts", 0, "assistant", "on the hour", None, base)
    add("conv-boundary-ts", 1, "assistant", "on the minute", None, base + 60)
    add("conv-boundary-ts", 2, "assistant", "next hour edge", None, base + 3600)
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    df["ts"] = EPOCH_START + df["ts"].to_numpy().astype("timedelta64[s]")
    return df


def gen_transcripts(
    n_convs: int = 100,
    seed: int = 42,
    hot_turns: int = 2000,
    include_edges: bool = True,
) -> pd.DataFrame:
    """Generate the deterministic transcript table.

    Conv lengths ~ Zipf(1.3) clamped to [5, 200]; three named hot convs
    (``conv-hot-1..3``) get ``hot_turns`` turns each to exercise salting.
    Stable order: (conv_id, turn_idx).
    """
    rng = np.random.default_rng(seed)
    pool = _make_text_pool(rng)
    conv_ids = np.array([f"conv-{i:08d}" for i in range(n_convs)], dtype=object)
    n_turns = np.clip(rng.zipf(1.3, n_convs), 5, 200).astype(np.int64)
    frames = [_assemble(conv_ids, n_turns, rng, pool)]
    hot_ids = np.array(["conv-hot-1", "conv-hot-2", "conv-hot-3"], dtype=object)
    hot_n = np.array([hot_turns, hot_turns // 2, hot_turns // 4], dtype=np.int64)
    frames.append(_assemble(hot_ids, hot_n, rng, pool))
    if include_edges:
        frames.append(_edge_convs())
    df = pd.concat(frames, ignore_index=True)
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    return df


def write_transcripts_parquet(
    path: str,
    n_convs: int,
    seed: int = 42,
    hot_turns: int = 2000,
    chunk_convs: int = 20000,
    turns_scale: int = 1,
) -> int:
    """Write the generated table to parquet in conv chunks (bench scale).

    Uses independent per-chunk seeds derived from ``seed`` so chunking does
    not change content for a given (n_convs, seed, chunk layout).
    Returns total rows written.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    import os

    os.makedirs(path, exist_ok=True)
    total = 0
    part = 0
    for lo in range(0, n_convs, chunk_convs):
        hi = min(lo + chunk_convs, n_convs)
        rng = np.random.default_rng([seed, lo])
        pool = _make_text_pool(rng)
        conv_ids = np.array(
            [f"conv-{i:08d}" for i in range(lo, hi)], dtype=object
        )
        n_turns = (
            np.clip(rng.zipf(1.3, hi - lo), 5, 200).astype(np.int64) * turns_scale
        )
        df = _assemble(conv_ids, n_turns, rng, pool)
        if lo == 0:
            rng2 = np.random.default_rng([seed, 2**31])
            hot = _assemble(
                np.array(["conv-hot-1", "conv-hot-2", "conv-hot-3"], dtype=object),
                np.array([hot_turns, hot_turns // 2, hot_turns // 4], dtype=np.int64),
                rng2,
                pool,
            )
            df = pd.concat([df, hot, _edge_convs()], ignore_index=True)
        table = pa.Table.from_pandas(df, preserve_index=False)
        pq.write_table(table, os.path.join(path, f"part-{part:05d}.parquet"))
        total += len(df)
        part += 1
    return total


def token_count(text_series: pd.Series) -> pd.Series:
    """Token-count proxy: len(text)//4 (FIXTURES.md §1)."""
    return (text_series.str.len() // 4).astype("int64")
