#!/usr/bin/env python3
"""Dev-only sf-extrapolation generator for SCALING.md measurements:
builds an sfN directory (default 10x sf0.1 = "sf1") from an existing
driver-generated SF so sec-vs-sf slopes can be measured beyond the
shipped testdata. NOT part of the library; driver-side python only.

Method (deterministic, seed 42):
- region/nation: fixed dims, copied verbatim.
- customer/supplier/part/orders/lineitem/events: tiled KX with key
  shifts that preserve referential integrity and per-tile value
  distributions (join fan-out, group cardinalities and selectivities
  match the source SF; key spaces grow exactly KX, the way real SF
  scaling grows them).
- documents: REGENERATED (not tiled -- tiling would give every doc
  exact duplicates and distort the dedup family): token unigrams,
  token-count-per-doc, and the (lang, source) joint all resampled from
  the source's empirical distributions.
- embeddings: base vectors resampled with replacement + small seeded
  gaussian noise, labels ride the sampled row.

Usage: python3 tools/gen_scale.py <srcDir> <outDir> [K=10]
"""
import os
import sys

import duckdb
import numpy as np
import pandas as pd

SEED = 42


def main(src: str, out: str, k: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    rng = np.random.default_rng(SEED)

    def rd(name: str) -> pd.DataFrame:
        return con.sql(f"SELECT * FROM '{src}/{name}.parquet'").df()

    def wr(name: str, df: pd.DataFrame) -> None:
        con.register("t", df)
        con.sql(f"COPY t TO '{out}/{name}.parquet' (FORMAT PARQUET)")
        con.unregister("t")
        print(f"{name}: {len(df)} rows")

    # fixed dims
    for name in ("region", "nation"):
        wr(name, rd(name))

    # tiled fact/dim tables: shift each key column by its source span
    def tile(name: str, shifts: dict) -> None:
        base = rd(name)
        spans = {c: int(base[c].max()) + 1 for c in shifts}
        tiles = []
        for i in range(k):
            t = base.copy()
            for c in shifts:
                t[c] = t[c] + i * spans[c]
            tiles.append(t)
        wr(name, pd.concat(tiles, ignore_index=True))

    tile("customer", {"c_custkey": 1})
    tile("supplier", {"s_suppkey": 1})
    tile("part", {"p_partkey": 1})
    tile("orders", {"o_orderkey": 1, "o_custkey": 1})
    tile("lineitem", {"l_orderkey": 1, "l_partkey": 1, "l_suppkey": 1})
    tile("events", {"event_id": 1, "user_id": 1})

    # documents: resample from empirical distributions
    docs = rd("documents")
    n_docs = len(docs) * k
    toks = [t for s in docs["text"].dropna() for t in s.split(" ") if t]
    vocab, counts = np.unique(toks, return_counts=True)
    tok_p = counts / counts.sum()
    lens = np.array([len([t for t in s.split(" ") if t])
                     for s in docs["text"].dropna()])
    ls = docs[["lang", "source"]]
    ls_idx = rng.integers(0, len(ls), n_docs)
    doc_lens = rng.choice(lens, n_docs, replace=True)
    texts = []
    for n in doc_lens:
        texts.append(" ".join(rng.choice(vocab, int(n), p=tok_p)))
    wr("documents", pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": ls["lang"].values[ls_idx],
        "source": ls["source"].values[ls_idx],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64)}))

    # embeddings: resample + seeded noise
    emb = rd("embeddings")
    n_vec = len(emb) * k
    base_idx = rng.integers(0, len(emb), n_vec)
    mat = np.stack(emb["embedding"].values)[base_idx]
    mat = mat + rng.normal(0.0, 0.05 * mat.std(), mat.shape)
    wr("embeddings", pd.DataFrame({
        "vec_id": np.arange(n_vec, dtype=np.int64),
        "embedding": [row.astype(np.float32) for row in mat],
        "label": emb["label"].values[base_idx]}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 10)
