"""Generate sf1-SCALE synthetic tables (10x sf0.1) for the growth-curve
sweep (VERDICT r2, next-round #4). The driver ships no sf1, so this
mimics the driver corpus's measured character (read from the real sf0.1
footers/values, documented in FIXTURES.md):

- documents: bag-of-words over the SAME 31-word vocabulary, uniform
  lengths 10-100 tokens (sf0.1 measures min 10 / max 100 / mean 54),
  langs weighted like sf0.1 (~41% en, rest ~15% each), 20 sources,
  plus the same light exact-dup rate (~0.2%)
- events: 10x rows, 10x users, 5 event types, value ~ |N(0,1)|*80
  capped, 30-day microsecond timestamps
- embeddings: 10x vectors, 64-dim float32 in ~[-0.4, 0.4], labels 0-9

Everything seeds from a fixed numpy RandomState so reruns are
identical. Writes parquet under .scratch/sf1x/ (gitignored; outside
/root/testdata which is read-only). Other tables symlink to sf0.1 so
loaders that touch the relational side keep working.

Usage: python scripts/gen_scale.py [mult]   (default 10)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "fr", "es", "zh"]
LANG_W = [0.41, 0.14, 0.15, 0.15, 0.15]

BASE = {"documents": 5000, "events": 100_000, "embeddings": 2000}


def gen(out_dir: str, mult: int) -> None:
    rng = np.random.RandomState(42)
    os.makedirs(out_dir, exist_ok=True)

    # documents
    n_docs = BASE["documents"] * mult
    lens = rng.randint(10, 101, size=n_docs)
    toks = rng.randint(0, len(VOCAB), size=int(lens.sum()))
    texts, off = [], 0
    vocab = np.array(VOCAB)
    for ln in lens:
        texts.append(" ".join(vocab[toks[off:off + ln]]))
        off += ln
    # plant the sf0.1-like exact-dup tail (8 dups / 5000 docs)
    for i in range(0, n_docs // 625):
        texts[n_docs - 1 - i] = texts[i]
    langs = rng.choice(LANGS, size=n_docs, p=LANG_W)
    sources = np.char.add("src", rng.randint(0, 20, size=n_docs).astype(str))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_docs), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{out_dir}/documents.parquet",
    )

    # events
    n_ev = BASE["events"] * mult
    ts0 = np.datetime64("2024-01-01T00:00:00.000000")
    span_us = 30 * 86_400 * 1_000_000
    ts = ts0 + rng.randint(0, span_us, size=n_ev).astype("timedelta64[us]")
    ts.sort()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n_ev), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(rng.randint(0, 1500 * mult, size=n_ev), pa.int64()),
                "event_type": pa.array(
                    rng.choice(["view", "click", "purchase", "signup", "error"], size=n_ev),
                    pa.string(),
                ),
                "value": pa.array(
                    np.round(np.abs(rng.randn(n_ev)) * 80.0, 2), pa.float64()
                ),
                "props": pa.array(["{}"] * n_ev, pa.string()),
            }
        ),
        f"{out_dir}/events.parquet",
    )

    # embeddings
    n_emb = BASE["embeddings"] * mult
    emb = (rng.rand(n_emb, 64).astype(np.float32) - 0.5) * 0.8
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_emb), pa.int64()),
                "embedding": pa.array(list(emb), pa.list_(pa.float32())),
                "label": pa.array(rng.randint(0, 10, size=n_emb), pa.int32()),
            }
        ),
        f"{out_dir}/embeddings.parquet",
    )

    # relational side: symlink the real sf0.1 tables
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"/root/testdata/sf0.1/{t}.parquet", dst)
    print(f"wrote {out_dir}: docs={n_docs} events={n_ev} emb={n_emb}")


# Key columns shifted per copy when tiling the relational graph side.
# Tiling = `mult` disjoint copies of the sf0.1 trade graph with keys
# offset by copy_index * (max_key + 1): schema identical, degree
# distribution identical, |V| and |E| exactly linear in mult — the
# right corpus for measuring whether the ITERATIVE graph family
# (BFS / HITS / LPA / k-core) is linear in edges (VERDICT r3 #5).
# Copy 0 keeps original keys, so fixed seeds (e.g. BFS's
# s_suppkey < 5) still exist.
_GRAPH_KEYS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "supplier": ["s_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
}

# One shift per KEY DOMAIN, not per column: if a fact table's max
# referenced FK sits below the dimension's max key (e.g. o_custkey
# never reaching max c_custkey), per-column offsets would shift the
# two sides by different amounts and silently misalign cross-table
# joins in copies 1..mult-1. The domain offset is the max over EVERY
# column referencing the domain, so all sides shift identically.
_KEY_DOMAIN = {
    "o_orderkey": "orderkey", "l_orderkey": "orderkey",
    "o_custkey": "custkey", "c_custkey": "custkey",
    "l_partkey": "partkey", "p_partkey": "partkey",
    "l_suppkey": "suppkey", "s_suppkey": "suppkey",
}


def gen_graph(out_dir: str, mult: int) -> None:
    """Tile the sf0.1 relational tables `mult`x with disjoint key
    spaces; symlink the document/event/embedding side to sf0.1."""
    import pyarrow.compute as pc

    os.makedirs(out_dir, exist_ok=True)
    tables = {
        t: pq.read_table(f"/root/testdata/sf0.1/{t}.parquet")
        for t in _GRAPH_KEYS
    }
    domain_off: dict[str, int] = {}
    for t, keys in _GRAPH_KEYS.items():
        for k in keys:
            dom = _KEY_DOMAIN[k]
            mx = pc.max(tables[t].column(k)).as_py() + 1
            domain_off[dom] = max(domain_off.get(dom, 0), mx)
    for t, keys in _GRAPH_KEYS.items():
        base = tables[t]
        copies = [base]
        for i in range(1, mult):
            shifted = base
            for k in keys:
                idx = shifted.schema.get_field_index(k)
                shifted = shifted.set_column(
                    idx, k,
                    pc.add(shifted.column(k), domain_off[_KEY_DOMAIN[k]] * i),
                )
            copies.append(shifted)
        pq.write_table(pa.concat_tables(copies), f"{out_dir}/{t}.parquet")
    for t in ["region", "nation", "documents", "events", "embeddings"]:
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"/root/testdata/sf0.1/{t}.parquet", dst)
    print(f"wrote {out_dir}: {mult}x tiled relational graph")


def gen_planted(out_dir: str, n_planted: int = 10_000) -> None:
    """Embeddings tile with a PLANTED SRP mega-bucket (VERDICT r6 #6):
    the real sf0.1 embeddings plus `n_planted` vectors of the form
    base*(1-t) + noise*t with t=0.5 — measured against the actual
    srp_signatures pipeline (seed 777, base drawn like the corpus):
    the largest (k, bv) band bucket holds ~4.0k of the planted rows
    (>> the 256 split threshold, so semdedup's depth-1 refinement
    FIRES) and its largest rv-leaf ~1.3k (so depth-2 fires too) —
    the regime no shipped SF reaches (max bucket 312 at 10x). Other
    tables symlink sf0.1. Deterministic (fixed RandomState)."""
    import pyarrow.parquet as _pq

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(777)
    base = (rng.rand(64).astype(np.float32) - 0.5) * 0.8
    t = 0.5
    noise = (rng.rand(n_planted, 64).astype(np.float32) - 0.5) * 0.8
    planted = base[None, :] * (1 - t) + noise * t
    real = _pq.read_table("/root/testdata/sf0.1/embeddings.parquet")
    n_real = real.num_rows
    emb_col = list(real.column("embedding").to_pylist()) + [
        [float(x) for x in v] for v in planted
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(
                    list(real.column("vec_id").to_pylist())
                    + list(range(n_real, n_real + n_planted)),
                    pa.int64(),
                ),
                "embedding": pa.array(emb_col, pa.list_(pa.float32())),
                "label": pa.array(
                    list(real.column("label").to_pylist())
                    + [int(x) for x in rng.randint(0, 10, size=n_planted)],
                    pa.int32(),
                ),
            }
        ),
        f"{out_dir}/embeddings.parquet",
    )
    for t_name in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "events",
    ]:
        dst = f"{out_dir}/{t_name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"/root/testdata/sf0.1/{t_name}.parquet", dst)
    print(f"wrote {out_dir}: emb={n_real + n_planted} ({n_planted} planted)")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mult = int(args[0]) if args else 10
    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch"
    )
    if "--graph" in sys.argv:
        gen_graph(os.path.join(scratch, f"graph{mult}x"), mult)
    elif "--planted" in sys.argv:
        gen_planted(os.path.join(scratch, "planted1x"))
    else:
        gen(os.path.join(scratch, f"sf{mult}x"), mult)
