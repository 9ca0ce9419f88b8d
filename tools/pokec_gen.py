#!/usr/bin/env python3
"""Emit a pokec-profile social graph (users.parquet + friendships.parquet)
for the mgbench workload bench (PokecBench / PokecGraphLoader native mode).

Profiles mirror the reference's dataset shapes
(reference tests/mgbench/workloads/pokec.py SIZES):
  small:  10,000 users /   ~121,716 friendships  (avg out-degree ~12.2)
  medium: 100,000 users / ~1,768,515 friendships (avg out-degree ~17.7)
  large:  1,632,803 users / ~30,622,564 friendships (avg out-degree ~18.8)

Degrees are power-law-ish on BOTH sides (the real pokec graph is a
scale-free social network): out-degrees are drawn from a Pareto
distribution scaled to the target mean, destinations from a Zipf-like
rank distribution over a fixed permutation of the id space, so a handful
of users are super-popular (in-degree skew — what stresses the engine's
shuffle/skew handling). Deterministic: numpy RandomState(42).

User properties follow the gate-side derivation (age/gender/
completion_percentage as deterministic functions of id) so the same
query text is meaningful on both datasets.

Usage: pokec_gen.py <out_dir> <small|medium|large|tiny>
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

PROFILES = {
    # name: (n_vertices, target_edges)
    "tiny": (1000, 12000),
    "small": (10000, 121716),
    "medium": (100000, 1768515),
    # the reference's third published size (pokec.py SIZES "large")
    "large": (1632803, 30622564),
}


def main() -> None:
    out, profile = sys.argv[1], sys.argv[2]
    n, target_edges = PROFILES[profile]
    rng = np.random.RandomState(42)

    import os
    os.makedirs(out, exist_ok=True)

    ids = np.arange(n, dtype=np.int64)
    users = pa.table({
        "id": ids,
        "age": (ids * 37) % 80,
        "gender": ids % 2,
        "completion_percentage": (ids * 13) % 100,
    })
    pq.write_table(users, f"{out}/users.parquet")

    # Out-degrees: Pareto(alpha=2.0) scaled to the target mean, clipped.
    # The 1.14 factor compensates for the parallel-edge dedup below
    # (popular destinations absorb repeated draws) so the emitted edge
    # count lands on the reference profile.
    mean_deg = target_edges / n * 1.14
    raw = rng.pareto(2.0, size=n) + 1.0  # mean 2 for alpha=2
    deg = np.maximum(1, (raw * (mean_deg / 2.0)).astype(np.int64))
    deg = np.minimum(deg, n - 1)

    # Destination popularity: Zipf-ish over a fixed permutation so that
    # popular ids are spread across the keyspace (not just low ids).
    perm = rng.permutation(n)
    ranks = np.arange(1, n + 1, dtype=np.float64)
    pop = 1.0 / ranks ** 0.9
    pop /= pop.sum()

    srcs = np.repeat(ids, deg)
    dsts = perm[rng.choice(n, size=srcs.size, p=pop)]
    keep = srcs != dsts
    srcs, dsts = srcs[keep], dsts[keep]
    # dedup parallel edges (pokec has none)
    pairs = np.unique(srcs * np.int64(n) + dsts)
    srcs, dsts = pairs // n, pairs % n

    fr = pa.table({"src": srcs.astype(np.int64), "dst": dsts.astype(np.int64)})
    pq.write_table(fr, f"{out}/friendships.parquet")

    indeg = np.bincount(dsts, minlength=n)
    print(f"{profile}: {n} users, {len(srcs)} friendships "
          f"(target {target_edges}), max in-degree {indeg.max()}, "
          f"max out-degree {np.bincount(srcs, minlength=n).max()}")


if __name__ == "__main__":
    main()
