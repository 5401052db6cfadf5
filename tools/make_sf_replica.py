"""Build an sfN-scale MEASUREMENT replica of /root/testdata/sf0.1 by
replicating each table K times with offset keys (single parquet file,
single row group per table — the same worst-case layout the driver's
generated data has). For perf measurement only, NOT for oracle runs:
text near-dup structure is K-fold inflated vs organic data, so dedup
queries read pessimistic here.

Usage: python tools/make_sf_replica.py [K] [OUTDIR]
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1rep")

# key columns to offset per replica so joins keep 1:N shape instead of
# fanning out K^2
OFFSETS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "nation": [],
    "region": [],
}
BIG = 100_000_000


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    for name, keys in OFFSETS.items():
        t = pq.read_table(SRC / f"{name}.parquet")
        if not keys or name in ("nation", "region", "supplier", "part"):
            # dimension tables stay as-is (joins reference them K:1)
            reps = [t]
            if name in ("part", "supplier"):
                reps = []
                for k in range(K):
                    tt = t
                    for key in keys:
                        idx = tt.schema.get_field_index(key)
                        col = pc.add(tt.column(key), k * BIG)
                        tt = tt.set_column(idx, key, col)
                    reps.append(tt)
        else:
            reps = []
            for k in range(K):
                tt = t
                for key in keys:
                    idx = tt.schema.get_field_index(key)
                    col = pc.add(tt.column(key), k * BIG)
                    tt = tt.set_column(idx, key, col)
                reps.append(tt)
        out = pa.concat_tables(reps)
        pq.write_table(out, OUT / f"{name}.parquet",
                       row_group_size=max(out.num_rows, 1), compression="zstd")
        print(name, out.num_rows, "rows ->", OUT / f"{name}.parquet")


if __name__ == "__main__":
    main()
