#!/usr/bin/env python3
"""Synthesize a 384-dim embeddings corpus (the reference's MiniLM
width, engine.go:65-95) and stage a gate-able data dir around it.

The r9 verdict asked for reference-dimension correctness to be
ORACLE-gated, not only spec'd (Dim384Spec): this writes a
deterministic 500-vector, 384-dim `embeddings.parquet` into OUT and
symlinks every other table from SRC, so tools/gate.py runs unchanged:

    python3 tools/gen_dim384.py                  # -> /tmp/dim384_data
    QUERIES=knn_cosine,knn_euclidean,knn_dot,knn_manhattan,\
vector_scan,vector_normalize,ann_ivf_static,ann_sq8,ann_bq_wide,\
ann_pq_static,ann_ivfpq_static,ann_pq_rerank \
      python3 tools/gate.py /tmp/dim384_data /tmp/dim384_out

Vectors are a seeded integer LCG mapped to [-0.5, 0.5) float32 —
deterministic across runs and platforms (no numpy RNG state), with
vec_id 0 reused as the query vector exactly like the SF corpora.
"""
import os, sys, pathlib
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dim384_data"
N, DIM = 500, 384

os.makedirs(OUT, exist_ok=True)

vecs, labels = [], []
for vid in range(N):
    state = vid * 2654435761 % (1 << 32)
    row = []
    for _ in range(DIM):
        state = (state * 1103515245 + 12345) % (1 << 31)
        row.append(state / float(1 << 31) - 0.5)
    vecs.append(row)
    labels.append(vid % 5)

tb = pa.table({
    "vec_id": pa.array(range(N), pa.int64()),
    "embedding": pa.array(vecs, pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32()),
})
pq.write_table(tb, f"{OUT}/embeddings.parquet")

for t in ("region nation customer supplier part orders lineitem "
          "events documents").split():
    dst = pathlib.Path(OUT) / f"{t}.parquet"
    if dst.is_symlink() or dst.exists():
        dst.unlink()
    dst.symlink_to(f"{SRC}/{t}.parquet")

print(f"gen_dim384: {N} vectors x {DIM} dims -> {OUT}/embeddings.parquet"
      f" (other tables symlinked from {SRC})")
