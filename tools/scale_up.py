#!/usr/bin/env python3
"""Synthesize a larger scale factor from an existing testdata dir by
key-shifted replication (bench-only data — no oracle runs against it).

Each fact table is replicated R times with its primary key (and the
foreign keys into other replicated tables) shifted by `replica *
keyspace`, so the graph the loader derives (ring+chord KNOWS over
contiguous custkeys, FROM_NATION, order/lineitem edges, documents,
embeddings) keeps its structure at R x the size. Dimension tables
(region, nation) are shared. Schemas are preserved bit-for-bit via
pyarrow (events.ts's timestamp unit has drifted across driver
regenerations; a SQL roundtrip could silently recast it).

Usage: scale_up.py <src_dir> <dst_dir> <replicas>
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def main() -> None:
    src, dst, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os

    os.makedirs(dst, exist_ok=True)

    def read(name):
        return pq.read_table(f"{src}/{name}.parquet")

    def keyspace(tbl, col):
        return pc.max(tbl[col]).as_py() + 1

    cust = read("customer")
    supp = read("supplier")
    part = read("part")
    orders = read("orders")
    li = read("lineitem")
    ev = read("events")
    docs = read("documents")
    emb = read("embeddings")

    n_cust = keyspace(cust, "c_custkey")
    n_supp = keyspace(supp, "s_suppkey")
    n_part = keyspace(part, "p_partkey")
    n_ord = keyspace(orders, "o_orderkey")
    n_ev = keyspace(ev, "event_id")
    n_doc = keyspace(docs, "doc_id")
    n_vec = keyspace(emb, "vec_id")

    def shifted(tbl, shifts, r):
        cols = []
        for name in tbl.column_names:
            col = tbl[name]
            if name in shifts:
                delta = shifts[name] * r
                col = pc.add(col, pa.scalar(delta, type=col.type))
            cols.append(col)
        return pa.table(cols, names=tbl.column_names)

    def replicate(name, tbl, shifts):
        parts = [shifted(tbl, shifts, r) for r in range(reps)]
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{name}.parquet")
        print(f"{name}: {tbl.num_rows} -> {out.num_rows}")

    # shared dims: copy as-is
    for name in ("region", "nation"):
        pq.write_table(read(name), f"{dst}/{name}.parquet")

    replicate("customer", cust, {"c_custkey": n_cust})
    replicate("supplier", supp, {"s_suppkey": n_supp})
    replicate("part", part, {"p_partkey": n_part})
    replicate("orders", orders, {"o_orderkey": n_ord, "o_custkey": n_cust})
    replicate(
        "lineitem", li,
        {"l_orderkey": n_ord, "l_partkey": n_part, "l_suppkey": n_supp})
    replicate("events", ev, {"event_id": n_ev, "user_id": n_cust})
    replicate("documents", docs, {"doc_id": n_doc})
    replicate("embeddings", emb, {"vec_id": n_vec})


if __name__ == "__main__":
    main()
