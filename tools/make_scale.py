#!/usr/bin/env python3
"""Synthesize an sf1-equivalent fixture as K shards of sf0.1.

/root/testdata has no sf1, so the scale-up bench (BASELINE.md round-3
section) uses this: each of K shards is a key-shifted copy of sf0.1
with content DECORRELATED across shards, so data properties scale the
way a real 10x corpus does:

 - all primary/foreign keys shift consistently per shard (custkey and
   events.user_id share an offset because q20 joins them);
 - nation/region stay fixed (dims grow slower than facts);
 - documents.text gets every token prefixed with a shard tag, so
   near-dup structure WITHIN a shard matches sf0.1 and no cross-shard
   near-dups appear (duplicate density stays constant instead of
   every doc gaining K-1 twins);
 - embeddings rotate by shard index (norm-preserving; a vector and
   its rotation are uncorrelated), same reasoning;
 - events keep their timestamps (10x event rate in the same window —
   what a bigger deployment looks like) and the parquet TIMESTAMP(NS)
   physical type is preserved by never touching the column.

Usage: make_scale.py <src_sf_dir> <out_dir> <K>
"""
import hashlib
import re
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

CUST_OFF = 100_000
ORDER_OFF = 1_000_000
PART_OFF = 100_000
SUPP_OFF = 10_000
EVENT_OFF = 1_000_000
DOC_OFF = 100_000
VEC_OFF = 10_000

# table -> {column: per-shard offset}
SHIFTS = {
    "customer": {"c_custkey": CUST_OFF},
    "orders": {"o_orderkey": ORDER_OFF, "o_custkey": CUST_OFF},
    "lineitem": {"l_orderkey": ORDER_OFF, "l_partkey": PART_OFF,
                 "l_suppkey": SUPP_OFF},
    "part": {"p_partkey": PART_OFF},
    "supplier": {"s_suppkey": SUPP_OFF},
    "events": {"event_id": EVENT_OFF, "user_id": CUST_OFF},
    "documents": {"doc_id": DOC_OFF},
    "embeddings": {"vec_id": VEC_OFF},
}
COPY_ONLY = ["nation", "region"]
TOKEN_RE = re.compile(r"[A-Za-z0-9]+")


def block_signs(block: int) -> list:
    """Rademacher sign pattern for a 64-shard block.

    Signs come from sha256(block,i) rather than an integer-multiply
    bit trick: the Knuth-multiply pattern collided far earlier than
    its nominal period (ADVICE r7 — block 35 was the pure negation of
    block 0, blocks 16/87 identical, block 172 == block 0), silently
    violating the constant-duplicate-density invariant. A crypto hash
    makes collisions/negations astronomically unlikely, and
    assert_sign_patterns refuses loudly if they ever occur.
    """
    if block == 0:
        return [1.0] * 64
    return [1.0 if hashlib.sha256(f"{block},{i}".encode()).digest()[0] & 1
            else -1.0 for i in range(64)]


def assert_sign_patterns(k_shards: int) -> None:
    """Refuse loudly if any two blocks' sign patterns coincide or negate."""
    n_blocks = (k_shards - 1) // 64 + 1
    pats = [tuple(block_signs(b)) for b in range(n_blocks)]
    for a in range(n_blocks):
        for b in range(a + 1, n_blocks):
            neg = tuple(-x for x in pats[b])
            assert pats[a] != pats[b], f"sign collision: blocks {a},{b}"
            assert pats[a] != neg, f"sign negation: blocks {a},{b}"


def shard(table: pa.Table, name: str, k: int) -> pa.Table:
    if k == 0:
        return table  # shard 0 is the original fixture, bit-for-bit
    cols = {}
    for i, field in enumerate(table.schema):
        col = table.column(i)
        off = SHIFTS.get(name, {}).get(field.name)
        if off is not None:
            col = pc.add(col, pa.scalar(off * k, type=field.type))
        elif name == "documents" and field.name == "text":
            tag = f"x{k}"
            col = pa.array(
                [None if v is None else
                 TOKEN_RE.sub(lambda m: tag + m.group(0), v)
                 for v in col.to_pylist()], type=field.type)
        elif name == "embeddings" and field.name == "embedding":
            # Rotation decorrelates shards within a 64-block; past 64
            # shards (VERDICT r6 item 7) each block additionally flips
            # a deterministic Rademacher sign pattern per dimension —
            # norm-preserving, and two blocks' patterns differ in
            # ~half the dims, so cross-block dot products stay ~0
            # instead of shard 64 reproducing shard 0 exactly.
            rot = k % 64
            block = k // 64
            signs = block_signs(block)
            col = pa.array(
                [None if v is None else
                 [x * s for x, s in zip(v[rot:] + v[:rot], signs)]
                 for v in col.to_pylist()], type=field.type)
        cols[field.name] = col
    return pa.table(cols, schema=table.schema)


def main() -> None:
    src, out, k_shards = sys.argv[1], sys.argv[2], int(sys.argv[3])
    # Optional 4th arg: comma list of tables to emit (plus the dims).
    # The 640x rung-16 retrieval evidence run needs only `documents`
    # at that scale — writing the 11 GB full fixture would waste the
    # disk headroom the run itself needs.
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    # Embedding decorrelation: rotation by k % 64 within a block of
    # 64 shards, composed with a per-block sha256-derived Rademacher
    # sign flip beyond. assert_sign_patterns verifies at startup that
    # no two blocks in use coincide or negate each other (cheap:
    # K//64 patterns, pairwise compare).
    assert k_shards >= 1
    assert_sign_patterns(k_shards)
    import os
    os.makedirs(out, exist_ok=True)
    for name in COPY_ONLY:
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"),
                       f"{out}/{name}.parquet")
        print(f"{name}: copied")
    for name in SHIFTS:
        if only is not None and name not in only:
            continue
        base = pq.read_table(f"{src}/{name}.parquet")
        shards = [shard(base, name, k) for k in range(k_shards)]
        merged = pa.concat_tables(shards)
        # Row-group layout: pyarrow's default (1Mi-row groups) wrote
        # the 64x documents table as ONE 141 MB row group, and a
        # parquet scan cannot split inside a row group — every
        # narrow documents pass ran its scan+compute in a single
        # Spark task (found round 6: ta_cdc_chunk's 91 s "bytes-bound"
        # row was one core doing all the work). Cap groups so wide
        # tables split ~64 ways; data content is unchanged.
        pq.write_table(merged, f"{out}/{name}.parquet",
                       row_group_size=max(10_000, merged.num_rows // 64))
        print(f"{name}: {base.num_rows} -> {merged.num_rows}")


if __name__ == "__main__":
    main()
