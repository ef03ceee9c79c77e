#!/usr/bin/env python3
"""Synthesize /tmp/sf1 = 10x shard-replicated sf0.1 (driver-side tooling,
same class as check.py). Keys are shard-shifted so the union is a valid
star schema at 10x scale; shard 0 keeps original ids, so id-pinned query
constants (kmeans seeds vec_id<K, PPR seed customers {1,2}, batch-ANN
probes) keep their referents. region/nation are fixed enumerations and
are NOT replicated; nationkey FKs are left unshifted accordingly.
Texts/embeddings replicate verbatim (shifted ids, identical content) -
dedup/LSH queries then see 10-way duplicate groups, which is exactly the
skew-cap stress the near-dup family is designed for. Physical parquet
types carry over from the driver's current files by construction
(pyarrow reads and writes the same schema)."""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc
import os

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
SHARDS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# Offset rules: far above any base key's spread (max ~600k), and NOT a
# divisor of q64's synthetic +10M insert-key offset - otherwise shard
# k's real keys collide with shard k-5's synthetic SCD inserts and the
# update batch carries two rows for one key (surfaced at the first sf1
# run with OFF=10M: q64 row diff). 3M divides into 10M with remainder
# 1M > any key spread, so no (i, j) shard pair can collide.
OFF = 3_000_000

# table -> columns shifted by shard*OFF
SHIFT = {
    "customer":  ["c_custkey"],
    "orders":    ["o_orderkey", "o_custkey"],
    "lineitem":  ["l_orderkey", "l_partkey", "l_suppkey"],
    "part":      ["p_partkey"],
    "supplier":  ["s_suppkey"],
    "events":    ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONCE = ["region", "nation"]

os.makedirs(DST, exist_ok=True)
for name in COPY_ONCE:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    pq.write_table(t, f"{DST}/{name}.parquet")
    print(f"{name}: {t.num_rows} rows (single copy)")

for name, cols in SHIFT.items():
    t = pq.read_table(f"{SRC}/{name}.parquet")
    shards = []
    for k in range(SHARDS):
        s = t
        if k > 0:
            for c in cols:
                i = s.schema.get_field_index(c)
                shifted = pc.add(s.column(c), pa.scalar(k * OFF, s.schema.field(c).type))
                s = s.set_column(i, s.schema.field(c), shifted)
        shards.append(s)
    out = pa.concat_tables(shards)
    pq.write_table(out, f"{DST}/{name}.parquet")
    print(f"{name}: {t.num_rows} -> {out.num_rows} rows")
