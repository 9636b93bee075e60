#!/usr/bin/env python3
"""Generate scaled-up `documents.parquet` tables for the SCALING.md
time-vs-rows study (builder-side tooling, never shipped library code).

Extends the driver's observed generative law (measured on
/root/testdata/sf0.1: 20 uniform sources, uniform 10-100 whitespace
tokens per doc drawn from a small vocabulary, ~5%% of docs paired with
ONE near-duplicate at 3-shingle Jaccard >= 0.8, a handful of exact
dups) to larger row counts, keeping per-row work and pair density
LINEAR in corpus size — the property that makes the timing curves
interpretable.

Usage: python3 scripts/gen_scale.py <n_docs> <out_dir> [seed]
"""
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    n_docs = int(sys.argv[1])
    out_dir = sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 420
    rng = random.Random(seed)

    # vocabulary + frequencies measured from the driver corpus
    src = pq.read_table("/root/testdata/sf0.1/documents.parquet")
    freq: dict[str, int] = {}
    for chunk in src.column("text").to_pylist():
        for w in chunk.split():
            freq[w] = freq.get(w, 0) + 1
    vocab = sorted(freq)
    weights = [freq[w] for w in vocab]
    langs = [v for v in src.column("lang").to_pylist()]

    docs: list[str] = []
    for _ in range(n_docs):
        n_tok = rng.randint(10, 100)
        docs.append(" ".join(rng.choices(vocab, weights=weights, k=n_tok)))

    # near-dups: pair 5% of docs with a copy mutated in ~2% of positions
    # (>= 0.8 3-shingle Jaccard on a 10-100 token doc), matching the
    # measured 25 pairs per 500 docs
    n_pairs = n_docs // 20
    for i in range(n_pairs):
        base = docs[i * 2].split()
        n_mut = max(1, len(base) // 50)
        for _ in range(n_mut):
            base[rng.randrange(len(base))] = rng.choice(vocab)
        docs[i * 2 + 1] = " ".join(base)
    # a sprinkle of exact dups (8 per 5000 at sf0.1)
    for i in range(max(1, n_docs // 625)):
        docs[n_pairs * 2 + i * 2 + 1] = docs[n_pairs * 2 + i * 2]

    order = list(range(n_docs))
    rng.shuffle(order)
    table = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array([docs[i] for i in order]),
        "lang": pa.array([langs[rng.randrange(len(langs))]
                          for _ in range(n_docs)]),
        "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
        "n_chars": pa.array([len(docs[i]) for i in order], pa.int64()),
    })
    import os
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, f"{out_dir}/documents.parquet")
    print(f"wrote {n_docs} docs -> {out_dir}/documents.parquet")


def gen_embeddings() -> None:
    """--emb mode: scaled `embeddings.parquet` matching the driver law
    measured on /root/testdata/sf0.1: 64-dim float32, L2-normalized
    (norm 1.0 exactly), ~isotropic directions (max natural pairwise
    cosine ~0.5 at 2k vectors), labels uniform over 0..9."""
    n_vecs = int(sys.argv[2])
    out_dir = sys.argv[3]
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 420
    import numpy as np
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n_vecs, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    table = pa.table({
        "vec_id": pa.array(range(n_vecs), pa.int64()),
        "embedding": pa.array([row for row in v.tolist()],
                              pa.list_(pa.float32())),
        "label": pa.array((np.arange(n_vecs) % 10).tolist(), pa.int32()),
    })
    import os
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, f"{out_dir}/embeddings.parquet")
    print(f"wrote {n_vecs} vectors -> {out_dir}/embeddings.parquet")


def gen_events() -> None:
    """--events mode: scaled `events.parquet` matching the driver law
    measured on /root/testdata/sf{0.01,0.1}: a FIXED 30-day span
    (2024-01-01..2024-01-30, so the windowed-agg state/window count stays
    constant while rows-per-window grows), users scaling with rows
    (1500 per 100k events), 5 uniform event types, uniform value, small
    json props, event_id in ts order, TIMESTAMP(NANOS) like the driver
    parquet."""
    n_events = int(sys.argv[2])
    out_dir = sys.argv[3]
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 420
    # optional 5th arg: timestamp unit ("ns" default | "us") — the µs
    # variant regenerates the SAME logical instants (truncated to µs)
    # under the other physical encoding, for the TsNorm
    # encoding-portability scaling comparison (r8 verdict #5)
    unit = sys.argv[5] if len(sys.argv) > 5 else "ns"
    rng = random.Random(seed)
    n_users = max(10, int(n_events * 1500 / 100000))
    types = ["view", "click", "purchase", "signup", "error"]
    span_ns = 30 * 24 * 3600 * 10**9
    base_ns = 1704067200 * 10**9  # 2024-01-01T00:00:00Z
    ts = sorted(rng.randrange(span_ns) for _ in range(n_events))
    ts_vals = ([base_ns + t for t in ts] if unit == "ns"
               else [(base_ns + t) // 1000 for t in ts])
    table = pa.table({
        "event_id": pa.array(range(n_events), pa.int64()),
        "ts": pa.array(ts_vals, pa.timestamp(unit)),
        "user_id": pa.array([rng.randrange(n_users) for _ in range(n_events)],
                            pa.int64()),
        "event_type": pa.array([types[rng.randrange(5)]
                                for _ in range(n_events)]),
        "value": pa.array([round(rng.uniform(0, 150), 2)
                           for _ in range(n_events)], pa.float64()),
        "props": pa.array(['{"k": %d}' % rng.randrange(100)
                           for _ in range(n_events)]),
    })
    import os
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, f"{out_dir}/events.parquet")
    print(f"wrote {n_events} events ({n_users} users) -> "
          f"{out_dir}/events.parquet")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--emb":
        gen_embeddings()
    elif len(sys.argv) > 1 and sys.argv[1] == "--events":
        gen_events()
    else:
        main()
