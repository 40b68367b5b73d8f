#!/usr/bin/env python
"""Generate a CLUSTERED embedding corpus (mixture of Gaussians) for
the structure-aware ANN sweep (r9 verdict #1).

The synthetic sf* embeddings are ISOTROPIC, so held-out IVF recall
tracks the scanned fraction — information-theoretically nothing to
prune (SWEEP_ann_r09). Real embedding corpora are clustered (topics,
languages, sources), which is the regime IVF exists for. This writes a
mixture corpus at the sf1 scale so the operating curve can be measured
where cluster structure exists:

* 20,000 vectors, 64-dim (same shape as .scale/sf1 embeddings);
* 32 spherical Gaussian components: unit-norm means drawn from a
  seeded rng (near-orthogonal at dim 64), per-dim noise sigma
  0.5/sqrt(64) — within-cluster cosine ~0.8, cross-cluster ~0;
* imbalanced component sizes (Dirichlet draw) — real corpora are
  never uniform, and probe calibration must survive small cells;
* schema matches the testdata embeddings table exactly
  (vec_id BIGINT, embedding FLOAT[], label INTEGER = the true
  component — the evaluation key ivf cells should rediscover).

Deterministic (fixed seed). Output: /root/repo/.scale/clustered/
embeddings.parquet (gitignored). Usage: python scripts/make_clustered.py
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(ROOT, ".scale", "clustered")

N = 20_000
DIM = 64
K = 32
SEED = 20260816


def main() -> int:
    rng = np.random.default_rng(SEED)
    means = rng.standard_normal((K, DIM))
    means /= np.linalg.norm(means, axis=1, keepdims=True)
    # imbalanced but never-empty component sizes
    props = rng.dirichlet(np.full(K, 2.0))
    sizes = np.maximum((props * N).astype(int), 50)
    sizes[0] += N - sizes.sum()  # exact total
    sigma = 0.5 / np.sqrt(DIM)

    labels = np.repeat(np.arange(K), sizes)
    X = means[labels] + sigma * rng.standard_normal((N, DIM))
    perm = rng.permutation(N)  # ids uncorrelated with components
    X, labels = X[perm], labels[perm]

    os.makedirs(DST, exist_ok=True)
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(N, dtype=np.int64)),
            "embedding": pa.array(
                list(X.astype(np.float32)), type=pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32)),
        }
    )
    out = os.path.join(DST, "embeddings.parquet")
    pq.write_table(table, out)
    print(f"written: {out} rows={N} dim={DIM} components={K} "
          f"sizes=[{sizes.min()}..{sizes.max()}]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
