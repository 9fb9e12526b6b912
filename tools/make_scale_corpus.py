"""Generate a seeded synthetic corpus one decade above sf0.1 (VERDICT r4
item 3): the scaling harnesses' third measurement point.

The driver's testdata stops at sf0.1 (5,000 documents / 2,000 vectors).
This tool extrapolates the SAME generative processes up a decade so the
near-linearity gates (tools/scaling_dedup.py, scaling_ann.py,
scaling_text.py) and the ANN recall floors can be measured on a corpus
big enough to expose superlinear growth and recall collapse:

  * documents: learns the base corpus's unigram word distribution, the
    doc token-length distribution, and the lang/source frequencies, then
    samples ``--doc-mult`` x as many iid documents — the same
    word-soup process the base tables visibly come from, so gram/dup
    statistics scale the way a real corpus-decade would.
  * embeddings: unit-normalized 64-dim gaussians with the base data's
    weak label-centroid pull (measured own-centroid cosine ~= 0.07),
    ``--vec-mult`` x the base count (default 50x -> 100k vectors, big
    enough that hyperplane buckets hold thousands of vectors each).

Everything is driven by one numpy PCG64 seed: same args -> identical
parquet bytes. Output dir mimics a testdata sf dir (documents.parquet +
embeddings.parquet), so every tool that takes an sf_dir accepts it.

Usage:
  python tools/make_scale_corpus.py [--out /tmp/sf1_synth]
      [--base /root/testdata/sf0.1] [--doc-mult 10] [--vec-mult 50]
      [--seed 4242]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def synth_documents(base: pd.DataFrame, mult: int, rng: np.random.Generator) -> pd.DataFrame:
    words, counts = np.unique(
        np.concatenate([t.split() for t in base["text"]]), return_counts=True
    )
    word_p = counts / counts.sum()
    lens = base["text"].str.split().str.len().to_numpy()
    langs, lang_c = np.unique(base["lang"], return_counts=True)
    srcs, src_c = np.unique(base["source"], return_counts=True)

    n = len(base) * mult
    doc_lens = rng.choice(lens, size=n, replace=True)
    total = int(doc_lens.sum())
    flat = rng.choice(words, size=total, replace=True, p=word_p)
    offsets = np.concatenate([[0], np.cumsum(doc_lens)])
    texts = [" ".join(flat[offsets[i] : offsets[i + 1]]) for i in range(n)]
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(langs, size=n, p=lang_c / lang_c.sum()),
            "source": rng.choice(srcs, size=n, p=src_c / src_c.sum()),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def synth_embeddings(base: pd.DataFrame, mult: int, rng: np.random.Generator) -> pd.DataFrame:
    dim = len(base["embedding"].iloc[0])
    n_labels = int(base["label"].max()) + 1
    n = len(base) * mult
    cents = rng.standard_normal((n_labels, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = rng.integers(0, n_labels, size=n)
    # own-centroid pull alpha: cos(v, c) ~= alpha for small alpha on
    # unit gaussians — matches the measured ~0.07 of the base data
    v = rng.standard_normal((n, dim)) + 0.07 * cents[labels] * np.sqrt(dim)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in v],
            "label": labels.astype(np.int32),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1_synth")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--doc-mult", type=int, default=10)
    ap.add_argument("--vec-mult", type=int, default=50)
    ap.add_argument("--seed", type=int, default=4242)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)

    base_docs = pq.read_table(os.path.join(args.base, "documents.parquet")).to_pandas()
    docs = synth_documents(base_docs, args.doc_mult, rng)
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        os.path.join(args.out, "documents.parquet"),
    )

    base_emb = pq.read_table(os.path.join(args.base, "embeddings.parquet")).to_pandas()
    emb = synth_embeddings(base_emb, args.vec_mult, rng)
    tbl = pa.Table.from_pandas(emb, preserve_index=False)
    tbl = tbl.set_column(
        tbl.schema.get_field_index("embedding"),
        pa.field("embedding", pa.list_(pa.float32())),
        tbl.column("embedding").cast(pa.list_(pa.float32())),
    )
    pq.write_table(tbl, os.path.join(args.out, "embeddings.parquet"))

    print(
        f"wrote {args.out}: documents={len(docs)} "
        f"(mean_tokens={docs['text'].str.split().str.len().mean():.1f}) "
        f"embeddings={len(emb)} (dim={len(emb['embedding'].iloc[0])}) seed={args.seed}"
    )


if __name__ == "__main__":
    raise SystemExit(main())
