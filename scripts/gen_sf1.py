#!/usr/bin/env python3
"""Build an sf1 (10x sf0.1) table set for the one-off full-suite bench
sweep (r15 verdict #6) — builder-side tooling, never shipped library
code.

TPC-H-ish tables (customer/orders/lineitem/part/supplier) are scaled by
REPLICATION with per-replica key offsets: every foreign key is offset by
the same span as its referenced table, so join fan-outs, filter
selectivities, and value distributions are preserved exactly while row
counts grow 10x — the property that makes a 10x timing point
interpretable against the sf0.1 baseline. region/nation are fixed dims
and copy through unchanged. documents/embeddings/events are generated
by scripts/gen_scale.py's measured-law generators at 10x rows (NOT
replicated: exact-copy replicas would concentrate degenerate duplicate
mass that the dedup/ANN queries never see in driver data).

Usage: python3 scripts/gen_sf1.py <out_dir>
"""
import os
import shutil
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# r16 verdict #2: the first sf1 set wrote each generated table as ONE
# parquet file with ONE row group (pyarrow's default at these sizes), so
# every scan-heavy query ran its sf1 scan on ONE Spark task and the
# sweep's text-family ratios measured single-core throughput, not
# parallel plans. Spark assigns one task per <=maxPartitionBytes file
# SLICE, so multiple row groups inside one 16 MB file still scan on one
# task — the tables that need parallel scans must be MULTIPLE FILES.
# `<name>.parquet` becomes a DIRECTORY of part files (Spark and pyarrow
# both read it transparently); row_group_size keeps groups small enough
# for in-file pruning.
SPLIT_FILES = 16


def resplit(out_dir: str, name: str, files: int = SPLIT_FILES) -> None:
    path = f"{out_dir}/{name}.parquet"
    t = pq.read_table(path)
    tmp = path + ".split"
    os.makedirs(tmp, exist_ok=True)
    n = t.num_rows
    step = (n + files - 1) // files
    for i in range(files):
        chunk = t.slice(i * step, step)
        if chunk.num_rows == 0:
            break
        pq.write_table(chunk, f"{tmp}/part-{i:05d}.parquet",
                       row_group_size=max(1, step // 4))
    os.remove(path)
    shutil.move(tmp, path)
    print(f"resplit {name}: {n} rows -> {files} files")


def replicate(name: str, out_dir: str, offsets: dict[str, int]) -> None:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    chunks = []
    for i in range(REPLICAS):
        cols = {}
        for c in t.schema.names:
            col = t.column(c)
            if c in offsets and i > 0:
                col = pa.compute.add(col, offsets[c] * i)
            cols[c] = col
        chunks.append(pa.table(cols))
    out = pa.concat_tables(chunks)
    pq.write_table(out, f"{out_dir}/{name}.parquet")
    print(f"wrote {out.num_rows} rows -> {out_dir}/{name}.parquet")


def main() -> None:
    out_dir = sys.argv[1]
    os.makedirs(out_dir, exist_ok=True)

    # key spans measured from the source (max+1 keeps replica key ranges
    # disjoint and contiguous-ish)
    def span(name: str, col: str) -> int:
        t = pq.read_table(f"{SRC}/{name}.parquet", columns=[col])
        return pa.compute.max(t.column(col)).as_py() + 1

    cust = span("customer", "c_custkey")
    part = span("part", "p_partkey")
    supp = span("supplier", "s_suppkey")
    okey = span("orders", "o_orderkey")

    replicate("customer", out_dir, {"c_custkey": cust})
    replicate("part", out_dir, {"p_partkey": part})
    replicate("supplier", out_dir, {"s_suppkey": supp})
    replicate("orders", out_dir, {"o_orderkey": okey, "o_custkey": cust})
    replicate("lineitem", out_dir, {"l_orderkey": okey, "l_partkey": part,
                                    "l_suppkey": supp})
    for dim in ("region", "nation"):
        pq.write_table(pq.read_table(f"{SRC}/{dim}.parquet"),
                       f"{out_dir}/{dim}.parquet")
        print(f"copied {dim}")

    here = os.path.dirname(os.path.abspath(__file__))
    gen = os.path.join(here, "gen_scale.py")
    subprocess.run([sys.executable, gen, "50000", out_dir], check=True)
    subprocess.run([sys.executable, gen, "--emb", "20000", out_dir],
                   check=True)
    subprocess.run([sys.executable, gen, "--events", "1000000", out_dir,
                    "420", "us"], check=True)
    # multi-file layout for every scan-heavy table (see SPLIT_FILES note)
    for name in ("documents", "embeddings", "events", "lineitem",
                 "orders"):
        resplit(out_dir, name)


if __name__ == "__main__":
    main()
