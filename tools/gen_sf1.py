#!/usr/bin/env python
"""Generate a deterministic ~10x-of-sf0.1 dataset ("sf1") under /tmp for
the scaling study — one REAL 10x wall-clock point on top of the driver's
sf0.001/0.01/0.1 ladder (TESTDATA.md is read-only, so sf1 lives in
scratch and is regenerated per round; it is a tool, not a fixture).

Faithfulness choices (documented because they ARE the experiment):

- region/nation copy verbatim; customer/supplier/part/orders/lineitem/
  events replicate the sf0.1 rows 10x with key-space shifts that keep
  every foreign key inside its copy — value distributions (prices,
  dates, statuses, event types, timestamps) are preserved exactly, so
  per-row work matches sf0.1 and the 10x growth is purely row count.
- documents do NOT replicate: the driver's fixed 31-word vocabulary
  makes shared-shingle pair density QUADRATIC in corpus size (measured
  1.13M pairs at 5k docs — a 10x copy would be ~100x pairs), which no
  real corpus does (vocabulary grows with the corpus — Heaps' law).
  sf1 documents are 50k fresh docs over a 72-word vocabulary sampled
  UNIFORMLY (Heaps-scaled from the originals' 31 words; the 31
  originals stay in the vocab so stopword/lang features still fire)
  with 2% planted near-dups and 0.4% exact dups so the dedup operators
  keep real signal at linear pair density (measured 9.0M shared-shingle
  pairs at 50k docs vs 1.13M at 5k; a Zipf-weighted head was tried and
  REJECTED at a measured 160M pairs — frequent shingles collide
  everywhere).
- embeddings: 20k vectors from per-label Gaussians fitted to sf0.1
  (10 labels -> 2k/label, the driver's own label-growth trend).

Run: ``python tools/gen_sf1.py [dest]`` (default /tmp/spark_graft_sf1).
Deterministic (numpy PCG64 seed 42 + SQL-only replication).
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10
N_DOCS = 50_000
N_EMB = 20_000
SEED = 42


def replicate_tpch(con: duckdb.DuckDBPyConnection, dest: str) -> None:
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{dest}/{t}.parquet' (FORMAT PARQUET)"
        )
    shifts = {
        "customer": [("c_custkey", "mc")],
        "supplier": [("s_suppkey", "ms")],
        "part": [("p_partkey", "mp")],
        "orders": [("o_orderkey", "mo"), ("o_custkey", "mc")],
        "lineitem": [("l_orderkey", "mo"), ("l_partkey", "mp"), ("l_suppkey", "ms")],
        "events": [("event_id", "me"), ("user_id", "mu")],
    }
    maxes = {
        "mc": "SELECT max(c_custkey) + 1 FROM read_parquet('{s}/customer.parquet')",
        "ms": "SELECT max(s_suppkey) + 1 FROM read_parquet('{s}/supplier.parquet')",
        "mp": "SELECT max(p_partkey) + 1 FROM read_parquet('{s}/part.parquet')",
        "mo": "SELECT max(o_orderkey) + 1 FROM read_parquet('{s}/orders.parquet')",
        "me": "SELECT max(event_id) + 1 FROM read_parquet('{s}/events.parquet')",
        "mu": "SELECT max(user_id) + 1 FROM read_parquet('{s}/events.parquet')",
    }
    vals = {k: con.execute(v.format(s=SRC)).fetchone()[0] for k, v in maxes.items()}
    for t, keyshifts in shifts.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        shifted = dict(keyshifts)
        sel = ", ".join(
            f"{c} + i * {vals[shifted[c]]} AS {c}" if c in shifted else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} "
            f"FROM read_parquet('{SRC}/{t}.parquet'), "
            f"unnest(range({COPIES})) AS g(i)) "
            f"TO '{dest}/{t}.parquet' (FORMAT PARQUET)"
        )


def gen_documents(con: duckdb.DuckDBPyConnection, dest: str) -> None:
    rng = np.random.default_rng(SEED)
    rows = con.execute(
        f"SELECT doc_id, text, lang, source FROM read_parquet('{SRC}/documents.parquet') "
        f"ORDER BY doc_id"
    ).fetchall()
    base_words: list[str] = sorted(
        {w for _, t, _, _ in rows for w in t.lower().split() if w.isalpha()}
    )
    lengths = np.array([len(t.split()) for _, t, _, _ in rows])
    langsrc = [(r[2], r[3]) for r in rows]
    # vocabulary: the 31 originals + fresh words to V=72, sampled
    # UNIFORM like the originals (measured: sf0.1 covers 27k of the 29.8k
    # possible 3-grams, i.e. near-uniform). V follows Heaps' law for the
    # 10x corpus (31 -> ~72 at beta~0.37); expected shared-shingle pairs
    # ~ (N_docs*52)^2 / (2*V^3) ~ 9M — linear-ish growth over sf0.1's
    # 1.13M, where a fixed vocab would give a quadratic ~113M. A Zipf
    # head was tried and REJECTED: frequent-shingle collisions pushed
    # pairs to 160M (worse than replication).
    alpha = "abcdefghijklmnopqrstuvwxyz"
    fresh = set()
    while len(fresh) < 72 - len(base_words):
        n = int(rng.integers(3, 9))
        w = "".join(alpha[i] for i in rng.integers(0, 26, n))
        if w not in base_words:
            fresh.add(w)
    vocab = base_words + sorted(fresh)
    weights = np.full(len(vocab), 1.0 / len(vocab))

    n_fresh = N_DOCS - int(0.02 * N_DOCS) - int(0.004 * N_DOCS)
    doc_lengths = rng.choice(lengths, size=n_fresh, replace=True)
    texts: list[str] = []
    vocab_arr = np.array(vocab)
    for ln in doc_lengths:
        idx = rng.choice(len(vocab), size=int(ln), p=weights)
        texts.append(" ".join(vocab_arr[idx]))
    # planted near-dups: copies of random fresh docs with ~2 words swapped
    n_near = int(0.02 * N_DOCS)
    for j in rng.integers(0, n_fresh, n_near):
        ws = texts[int(j)].split()
        for _ in range(2):
            ws[int(rng.integers(0, len(ws)))] = vocab[int(rng.integers(0, len(vocab)))]
        texts.append(" ".join(ws))
    # planted exact dups
    n_exact = int(0.004 * N_DOCS)
    for j in rng.integers(0, n_fresh, n_exact):
        texts.append(texts[int(j)])
    ls_idx = rng.integers(0, len(langsrc), len(texts))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([langsrc[i][0] for i in ls_idx], pa.string()),
            "source": pa.array([langsrc[i][1] for i in ls_idx], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{dest}/documents.parquet")


def gen_embeddings(con: duckdb.DuckDBPyConnection, dest: str) -> None:
    rng = np.random.default_rng(SEED + 1)
    rows = con.execute(
        f"SELECT vec_id, embedding, label FROM read_parquet('{SRC}/embeddings.parquet') "
        f"ORDER BY vec_id"
    ).fetchall()
    labels = sorted({r[2] for r in rows})
    by_label = {
        lab: np.array([r[1] for r in rows if r[2] == lab], dtype=np.float64)
        for lab in labels
    }
    per = N_EMB // len(labels)
    vecs, labs = [], []
    for lab in labels:
        m = by_label[lab].mean(axis=0)
        s = by_label[lab].std(axis=0) + 1e-6
        vecs.append(rng.normal(m, s, size=(per, len(m))).astype(np.float32))
        labs.extend([lab] * per)
    allv = np.concatenate(vecs)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(allv)), pa.int64()),
            "embedding": pa.array(list(allv), pa.list_(pa.float32())),
            "label": pa.array(labs, pa.int32()),
        }
    )
    pq.write_table(tbl, f"{dest}/embeddings.parquet")


def main() -> None:
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest)
    con = duckdb.connect()
    replicate_tpch(con, dest)
    gen_documents(con, dest)
    gen_embeddings(con, dest)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dest}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n}")
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
