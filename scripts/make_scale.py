#!/usr/bin/env python3
"""Scale-rehearsal data generator: replicate a driver testdata SF
directory K times with disjoint key ranges, preserving every schema
detail the gates depend on — in particular events.ts keeps whatever
physical timestamp encoding the source carries (TIMESTAMP(NANOS) in
early rounds, TIMESTAMP(MICROS) NTZ since round 8; pyarrow copies
either verbatim, and graft.Tables.events normalizes both). The output
is gate-compatible: graft.Verify + scripts/check.py run on it
unchanged, because Spark and the DuckDB oracle read the SAME files —
parity, not meaningfulness, is what the gate measures.

Replication scheme (replica r in 0..K-1):
  - every key/id column gets + r*OFFSET with OFFSET = 10^ceil(log10(max+1)),
    so replica key ranges are disjoint and FK joins stay consistent
    within a replica (orders.o_custkey and customer.c_custkey shift by
    the same offset, etc.).
  - embeddings get a deterministic per-element jitter (hash-seeded,
    uniform in +-JITTER) so the scaled corpus is a near-duplicate-heavy
    cloud rather than exact ties — harder for ANN, realistic for dedup.
  - nation/region (fixed dimension tables) are copied as-is; nationkey
    references in customer/supplier are left unshifted to match.
  - events keep their timestamps byte-for-byte; user/event ids shift,
    so sessionize/funnel windows replay identically per replica.

Usage: python3 scripts/make_scale.py SRC_DIR DST_DIR K [tables]
       [tables] = optional comma list restricting which tables are
       replicated (e.g. "embeddings" for the x1000 vector-only
       rehearsal — replicating 600M lineitem rows to scale one
       vector table 1000x would be all cost, no signal).
e.g.   python3 scripts/make_scale.py /root/testdata/sf0.1 /tmp/graft_sf1 10
sf10:  python3 scripts/make_scale.py /root/testdata/sf0.1 /tmp/graft_sf10 100
       (200k vectors / 60M lineitem, ~1.9 GB, ~3 min — the index-build
       stress gate; see BASELINE.md "Scale rehearsal - sf10" for the
       Verify/check.py subset recipe and recorded figures)
"""
import math
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key columns per table; everything else is copied per replica
KEYS = {
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
COPY_AS_IS = ["nation", "region"]
JITTER = 0.05


def offset_for(tables, col):
    """One shared decimal offset per key DOMAIN (o_custkey and
    c_custkey must shift identically), derived from the max over every
    table carrying that domain."""
    dom = col.split("_", 1)[1]  # custkey, orderkey, partkey, suppkey, ...
    mx = 0
    for name, keys in KEYS.items():
        for k in keys:
            if k.split("_", 1)[1] == dom:
                mx = max(mx, pc.max(tables[name][k]).as_py() or 0)
    return 10 ** math.ceil(math.log10(mx + 2))


def jittered(embs, r, rng):
    if r == 0:
        return embs
    flat = np.asarray(embs.values, dtype=np.float32)
    out = flat + rng.uniform(-JITTER, JITTER, size=flat.shape).astype(np.float32)
    return pa.ListArray.from_arrays(embs.offsets, pa.array(out, type=pa.float32()))


def main(src, dst, k, only=None):
    import os

    os.makedirs(dst, exist_ok=True)
    keep = set(only.split(",")) if only else None
    # offsets ALWAYS derive from the full key domains: a key domain
    # spans tables (vec_id/doc_id/event_id/user_id all share "id";
    # o_custkey and c_custkey share "custkey"), so deriving from a
    # restricted subset would shift ids differently than a full run —
    # the restricted corpus's keys would neither match a full corpus
    # nor stay disjoint from unreplicated tables if outputs combine.
    # Reading the extra source tables costs ~the sf0.1 dir (tens of MB).
    all_tables = {
        name: pq.read_table(f"{src}/{name}.parquet") for name in KEYS
    }
    offsets = {
        col: offset_for(all_tables, col) for cols in KEYS.values() for col in cols
    }
    # restriction stays in LOCALS: rebinding the module globals would
    # make a second in-process call (import-and-reuse, tests) silently
    # operate on the previously restricted table set
    keys_by_table = KEYS
    copy_as_is = COPY_AS_IS
    if keep is not None:
        keys_by_table = {n: c for n, c in KEYS.items() if n in keep}
        copy_as_is = [n for n in COPY_AS_IS if n in keep]
    tables = {
        name: all_tables[name] for name in keys_by_table
    }
    for name in copy_as_is:
        tables[name] = pq.read_table(f"{src}/{name}.parquet")
    for name in copy_as_is:
        pq.write_table(tables[name], f"{dst}/{name}.parquet")
        print(f"{name}: copied {tables[name].num_rows} rows")
    for name, keys in keys_by_table.items():
        t = tables[name]
        replicas = []
        for r in range(k):
            cols = {}
            for field in t.schema:
                c = t[field.name]
                if field.name in keys and r > 0:
                    c = pc.add(c, r * offsets[field.name]).cast(field.type)
                elif name == "embeddings" and field.name == "embedding":
                    rng = np.random.default_rng(42_000 + r)
                    c = jittered(t[field.name].combine_chunks(), r, rng)
                cols[field.name] = c
            replicas.append(pa.table(cols, schema=t.schema))
        out = pa.concat_tables(replicas)
        # Bounded row groups: pyarrow's default (1 Mi rows) leaves the
        # smaller tables as ONE row group, and a single-row-group file
        # is unsplittable — every Spark scan of it runs in one task no
        # matter how maxSplitBytes bins the byte ranges (observed at
        # the sf10 rehearsal: the whole exact-kNN distance scan pinned
        # on one core, then capped at 4-way when 64 Ki rows still gave
        # the 200 k-row embeddings table only 4 groups). Target ~32
        # groups per table (one per local core, capped at 64 Ki rows)
        # so Spark's bytesPerCore split logic actually yields parallel
        # scans — the layout a real multi-file 100 TB corpus has
        # anyway.
        rg = min(65536, max(4096, out.num_rows // 32))
        pq.write_table(out, f"{dst}/{name}.parquet", row_group_size=rg)
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows, "
              f"{-(-out.num_rows // rg)} row groups "
              f"(offsets {[offsets[kk] for kk in keys]})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]),
         sys.argv[4] if len(sys.argv) > 4 else None)
