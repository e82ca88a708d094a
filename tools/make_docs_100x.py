#!/usr/bin/env python3
"""100x-class documents/embeddings corpus (SURVEY 'Scale experiment',
round 9): the dedup/ANN/text/clustering family had only ever seen 10x
duplication; this builds a ~5M-doc corpus with MIXED composition so the
adaptive parameters (LSH depth keyed on canonical counts, bucket caps,
k-means adaptive k) are exercised at a regime where DISTINCT content is
~100x bigger too, not just duplicated:

  per copy k=1..COPIES-1 (copy 0 = sf0.1 verbatim), each row lands in a
  deterministic hash bucket:
  - 55% DISTINCT: tokens deterministically shuffled (seeded per (k,doc))
    plus a salt token -- same length distribution and vocabulary, near-zero
    3-shingle overlap with the original, so the distinct-content count
    grows ~linearly with COPIES;
  - 25% VERBATIM: uniform exact duplication (the canonicalize-first path's
    stress -- hundreds of copies per digest);
  - 15% ZIPF BOILERPLATE: text replaced by one of 32 hot docs, zipf-shaped
    (rank 0 carries half the rewrites) -- hot-digest mega-groups;
  - 5% NEAR-DUP: original minus its last (k%7)+1 tokens -- bounded families
    (<=7 distinct variants + the original), so LSH/CC see real near-dup
    clusters at scale without a quadratic pair graph.

  embeddings mirror the same mix (fresh seeded vectors / verbatim /
  32 hot vectors / tiny-noise perturbations for ANN near-dup).

Usage: make_docs_100x.py [SRC] [OUT] [COPIES]   (defaults sf0.1,
/tmp/sfdocs100x, 1000 copies ~= 5M docs / 2M vectors, a few GB).
Only documents.parquet and embeddings.parquet are written -- the TPC-H
side of the corpus is make_10x.py's job.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfdocs100x"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
os.makedirs(OUT, exist_ok=True)

# zipf-shaped lookup over ALL 32 hot ranks: rank r covers ~2^-(r+1) of
# rewrites down to the one-slot floor, so rank 0 carries ~half and every
# boilerplate doc occurs (the first cut of this table only reached rank 5,
# so the measured corpus had 6 mega-groups instead of the documented 32)
ZIPF32 = [r for r in range(32) for _ in range(max(1, 2 ** (10 - r)))]

M1, M2 = 1315423911, 2654435761  # mixing constants for the bucket hash


def bucket(doc_id: int, k: int) -> int:
    return ((doc_id * M1 + k * M2) ^ (doc_id >> 7)) % 100


# ---- documents -------------------------------------------------------------
src = pq.read_table(f"{SRC}/documents.parquet")
ids = src.column("doc_id").to_pylist()
texts = src.column("text").to_pylist()
langs = src.column("lang").to_pylist()
sources = src.column("source").to_pylist()
n = len(ids)
hot = [texts[(i * 977) % n] for i in range(32)]  # the 32 boilerplate docs

schema = pa.schema([
    ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
    ("source", pa.string()), ("n_chars", pa.int64()),
])
writer = pq.ParquetWriter(f"{OUT}/documents.parquet", schema)
counts = {"distinct": 0, "verbatim": 0, "zipf": 0, "neardup": 0}
for k in range(COPIES):
    out_ids, out_txt, out_lang, out_src, out_len = [], [], [], [], []
    for i in range(n):
        did = ids[i]
        if k == 0:
            t = texts[i]
        else:
            b = bucket(did, k)
            if b < 55:
                toks = texts[i].split(" ")
                rng = np.random.default_rng((did * COPIES + k) & 0x7FFFFFFF)
                rng.shuffle(toks)
                toks.insert(int(rng.integers(0, len(toks) + 1)), f"cp{k}x{b}")
                t = " ".join(toks)
                counts["distinct"] += 1
            elif b < 80:
                t = texts[i]
                counts["verbatim"] += 1
            elif b < 95:
                t = hot[ZIPF32[(did * M2 + k * M1) % len(ZIPF32)]]
                counts["zipf"] += 1
            else:
                toks = texts[i].split(" ")
                drop = (k % 7) + 1
                t = " ".join(toks[: max(1, len(toks) - drop)])
                counts["neardup"] += 1
        out_ids.append(did + k * 1_000_000)
        out_txt.append(t)
        out_lang.append(langs[i])
        out_src.append(sources[i])
        out_len.append(len(t))
    writer.write_table(pa.table(
        [out_ids, out_txt, out_lang, out_src, out_len], schema=schema))
writer.close()
print("documents mix:", counts, "total", COPIES * n)

# ---- embeddings ------------------------------------------------------------
esrc = pq.read_table(f"{SRC}/embeddings.parquet")
vids = esrc.column("vec_id").to_pylist()
vecs = np.array(esrc.column("embedding").to_pylist(), dtype=np.float32)
labels = esrc.column("label").to_pylist()
en, dim = vecs.shape
norm_mean = float(np.linalg.norm(vecs, axis=1).mean())
ehot = vecs[[(i * 977) % en for i in range(32)]]
n_labels = max(labels) + 1

eschema = pa.schema([
    ("vec_id", pa.int64()),
    ("embedding", pa.list_(pa.float32())),
    ("label", pa.int32()),
])
ewriter = pq.ParquetWriter(f"{OUT}/embeddings.parquet", eschema)
for k in range(COPIES):
    out_ids, out_vecs, out_lab = [], [], []
    for i in range(en):
        vid = vids[i]
        if k == 0:
            v, lab = vecs[i], labels[i]
        else:
            b = bucket(vid, k)
            rng = np.random.default_rng((vid * COPIES + k) & 0x7FFFFFFF)
            if b < 55:
                v = rng.standard_normal(dim).astype(np.float32)
                v *= norm_mean / max(1e-9, float(np.linalg.norm(v)))
                lab = int((vid * M1 + k) % n_labels)
            elif b < 80:
                v, lab = vecs[i], labels[i]
            elif b < 95:
                v, lab = ehot[ZIPF32[(vid * M2 + k * M1) % len(ZIPF32)]], labels[i]
            else:
                v = (vecs[i] + rng.standard_normal(dim).astype(np.float32)
                     * 0.01 * norm_mean).astype(np.float32)
                lab = labels[i]
        out_ids.append(vid + k * 1_000_000)
        out_vecs.append(v.tolist())
        out_lab.append(lab)
    ewriter.write_table(pa.table([out_ids, out_vecs, out_lab], schema=eschema))
ewriter.close()
for f in sorted(os.listdir(OUT)):
    print(f, os.path.getsize(os.path.join(OUT, f)))
