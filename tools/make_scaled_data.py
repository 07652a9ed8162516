"""Measurement-only 10x scale-up of /root/testdata/sf0.1 -> .data/sf1x.

The driver's round-end bench runs at a driver-generated sf1.0 that is not
present in the sandbox; this tool builds a structurally similar stand-in
so optimizations can be validated at that scale (guide §1: measure at the
scale you ship). NOT part of any query path — timing evidence only.

Scaling rules (keep per-entity structure, scale entity count linearly):
- events: 10 copies, ids offset per copy (user count scales with sf in
  the real generator; per-user series identical).
- documents: 10 copies; every word gets a per-copy suffix for copies>0,
  so intra-copy shingle/near-dup structure is IDENTICAL to sf0.1 while
  cross-copy docs share no shingles -> pair density scales linearly,
  exactly like independently generated docs.
- embeddings: 10 copies; per-copy seeded permutation of the 64 dims —
  dot products within a copy are permutation-invariant (cosine structure
  preserved), while LSH sign-bit keys decorrelate across copies ->
  bucket sizes stay O(sf0.1 sizes) x10 buckets, no fake pair blowup.
- lineitem/orders/customer: 10 copies with key offsets consistent with
  events.user_id (join_dim_rollup joins user_id = c_custkey).
- nation/region/supplier/part: copied as-is (bounded dims).
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".data", "sf1x")
COPIES = 10

OFF = {
    "event_id": 10**10,
    "user_id": 10**7,
    "doc_id": 10**7,
    "vec_id": 10**7,
    "c_custkey": 10**7,
    "o_custkey": 10**7,
    "o_orderkey": 10**9,
    "l_orderkey": 10**9,
    "s_suppkey": 10**7,
    "l_suppkey": 10**7,
    "p_partkey": 10**7,
    "l_partkey": 10**7,
}


def _offset_ids(tbl: pa.Table, i: int) -> pa.Table:
    import pyarrow.compute as pc

    for name, off in OFF.items():
        if name in tbl.schema.names and i > 0:
            idx = tbl.schema.get_field_index(name)
            col = tbl.column(name)
            typ = col.type
            newcol = pc.cast(pc.add(pc.cast(col, pa.int64()), i * off), typ)
            tbl = tbl.set_column(idx, name, newcol)
    return tbl


def _perturb_documents(tbl: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return tbl
    texts = tbl.column("text").to_pylist()
    suf = f"q{i}"
    out = [" ".join(w + suf for w in t.split()) if t else t for t in texts]
    idx = tbl.schema.get_field_index("text")
    return tbl.set_column(idx, "text", pa.array(out, type=tbl.column("text").type))


def _perturb_embeddings(tbl: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return tbl
    col = tbl.column("embedding").combine_chunks()
    arr = col.flatten().to_numpy(zero_copy_only=False)
    n = len(tbl)
    dim = len(arr) // n
    rng = np.random.RandomState(1234 + i)
    perm = rng.permutation(dim)
    mat = arr.reshape(n, dim)[:, perm]
    values = pa.array(mat.reshape(-1), type=col.type.value_type)
    new = pa.ListArray.from_arrays(
        pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32)), values
    ).cast(col.type)
    idx = tbl.schema.get_field_index("embedding")
    return tbl.set_column(idx, "embedding", new)


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    tables = [
        "region", "nation", "supplier", "part",
        "customer", "orders", "lineitem",
        "events", "documents", "embeddings",
    ]
    for t in tables:
        src = f"{SRC}/{t}.parquet"
        dst = f"{DST}/{t}.parquet"
        base = pq.read_table(src)
        if t in ("region", "nation", "supplier", "part"):
            shutil.copyfile(src, dst)
            print(t, "copied", base.num_rows)
            continue
        parts = []
        for i in range(COPIES):
            tb = _offset_ids(base, i)
            if t == "documents":
                tb = _perturb_documents(tb, i)
            elif t == "embeddings":
                tb = _perturb_embeddings(tb, i)
            parts.append(tb)
        out = pa.concat_tables(parts)
        # one row group, like the driver tables — keeps the scan-split
        # behaviour (the thing _spread reacts to) representative
        pq.write_table(out, dst, row_group_size=out.num_rows)
        print(t, "x", COPIES, "->", out.num_rows)


if __name__ == "__main__":
    sys.exit(main())
