"""Generate a LARGER synthetic corpus (documents + embeddings) matching
the driver corpus's distributions, for EMPIRICAL scale runs beyond the
largest driver-provided SF.

The driver testdata (TESTDATA.md) is read-only and tops out at sf0.1
(5k docs / 2k vectors). This synthesizes a deterministic corpus N x
bigger into an output dir (default .scratch/sf1, gitignored): same
schemas, same doc-length / lang / source / cluster-count shape, with
one DELIBERATE divergence — vocabulary. The driver corpus draws every
document from 31 words, which makes ~7% of ALL doc pairs jaccard>=0.9
near-dups: the near-dup OUTPUT is Theta(n^2), so every pairwise dedup
measurement on a 10x corpus is dominated by emitting 100x pairs, not
by the algorithm. Real corpora are the opposite (dups are a few
percent), so this generator uses a 10k-word Zipf vocabulary — random
docs never collide — and PLANTS the duplicate structure explicitly:
~2% near-duplicates (1-3 token edits) + ~0.2% exact copies, giving
O(n) true pairs, which is the regime the scale design targets.

Usage: python tools/gen_scale_corpus.py [out_dir] [multiplier]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]


def gen_documents(out_dir: str, n_docs: int, rng: np.random.RandomState):
    base_vocab = [
        r[0] for r in duckdb.sql(
            f"SELECT DISTINCT unnest(string_split(text, ' ')) AS t "
            f"FROM '{SRC}/documents.parquet' ORDER BY t"
        ).fetchall()
    ]
    vocab = np.array(
        [v for v in base_vocab if v]
        + [f"w{i:04d}" for i in range(10_000 - len(base_vocab))]
    )
    # Zipf-ish rank weights: realistic head-heavy token frequencies
    # (matters for the n-gram census / top-k paths), but with the head
    # damped (+100 offset) so two RANDOM docs stay at jaccard ~0.05 —
    # near-dup structure must come from the PLANTED dups, not the vocab
    w = 1.0 / (np.arange(len(vocab)) + 100.0)
    p = w / w.sum()
    texts: list[str] = []
    n_tok = rng.randint(10, 101, size=n_docs)
    dup_kind = rng.rand(n_docs)
    # vectorized Zipf draws in CHUNKS (a per-doc choice() call re-builds
    # the 10k-entry CDF per doc; a single full pool would hold ~50M+
    # numpy strings at the 1000x tier)
    chunk = 200_000
    pool = None
    off = pool_doc = 0
    for i in range(n_docs):
        if pool is None or pool_doc >= chunk:
            hi = min(i + chunk, n_docs)
            pool = vocab[rng.choice(
                len(vocab), size=int(n_tok[i:hi].sum()), p=p)]
            off = pool_doc = 0
        toks = pool[off:off + n_tok[i]]
        off += n_tok[i]
        pool_doc += 1
        if i > 100 and dup_kind[i] < 0.002:  # exact duplicate
            texts.append(texts[rng.randint(0, i)])
        elif i > 100 and dup_kind[i] < 0.02:  # near duplicate: edit 1-3 tokens
            base = texts[rng.randint(0, i)].split(" ")
            for _ in range(rng.randint(1, 4)):
                base[rng.randint(0, len(base))] = vocab[rng.randint(0, len(vocab))]
            texts.append(" ".join(base))
        else:
            texts.append(" ".join(toks))
    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    tbl = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs.tolist(), pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n_docs)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    # realistic row-group granularity: a single default-row-group file
    # can only split at ONE point, silently serializing every scan
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"),
                   row_group_size=10_000)
    return len(texts)


def gen_embeddings(out_dir: str, n_vecs: int, rng: np.random.RandomState):
    n_labels, dim = 10, 64
    centers = rng.normal(0.0, 0.15, size=(n_labels, dim))
    labels = rng.randint(0, n_labels, size=n_vecs)
    vecs = (centers[labels]
            + rng.normal(0.0, 0.08, size=(n_vecs, dim))).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(n_vecs), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
        "label": pa.array(labels.tolist(), pa.int32()),
    })
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))
    return n_vecs


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch", "sf1")
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(42)
    nd = gen_documents(out_dir, 5000 * mult, rng)
    nv = gen_embeddings(out_dir, 2000 * mult, rng)
    print(f"wrote {nd} documents, {nv} embeddings -> {out_dir}")


if __name__ == "__main__":
    main()
