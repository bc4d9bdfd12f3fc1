"""Deterministic clustered-embedding fixtures for ANN quality
measurement (verdict-r8 #5).

The shipped testdata embeddings are i.i.d. near-uniform — the WORST
case for ANN (no structure for a coarse quantizer to exploit, so IVF
recall there understates real behavior, and sign-LSH degenerates to
its bucket-share line). Real embedding corpora are clustered; this
module synthesizes a mixture-of-Gaussians corpus with the properties
the oracle-checked pipeline needs:

- **deterministic**: fixed-seed numpy RandomState; same bytes on every
  call, no RNG at query time;
- **integer-quantized** to the dyadic 1/64 grid, so every coordinate
  is EXACTLY representable in float32 — both engines read identical
  bytes and ``simsearch.quantized``'s fixed-point mapping of them is
  reproducible bit-for-bit;
- **imbalanced mixture** (weights proportional to cluster index + 1)
  so the fixture exercises skewed cells, not an idealized uniform
  partition.
"""

from __future__ import annotations

import numpy as np

#: dyadic quantization grid (1/64 steps are exact in float32)
Q = 64


def clustered_vectors(
    n: int = 2000,
    dim: int = 64,
    n_clusters: int = 16,
    seed: int = 7,
    spread: float = 0.25,
):
    """Return ``(vec_ids, embeddings, labels)`` — a deterministic
    mixture-of-Gaussians corpus: unit-ish cluster centers, per-point
    Gaussian spread, every coordinate quantized to the 1/64 grid.
    ``labels`` is the true mixture component (for diagnostics only —
    the ANN paths never see it)."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim).astype(np.float64)
    weights = np.arange(1, n_clusters + 1, dtype=np.float64)
    weights /= weights.sum()
    labels = rng.choice(n_clusters, size=n, p=weights)
    pts = centers[labels] + spread * rng.randn(n, dim)
    pts = np.round(pts * Q) / Q  # integer-quantize on the shared grid
    return (
        np.arange(n, dtype=np.int64),
        pts.astype(np.float32),
        labels.astype(np.int32),
    )


def clustered_embeddings_df(
    spark,
    n: int = 2000,
    dim: int = 64,
    n_clusters: int = 16,
    seed: int = 7,
    spread: float = 0.25,
):
    """The clustered corpus as a DataFrame in the embeddings-table
    shape ``(vec_id bigint, embedding array<float>, label int)``."""
    ids, pts, labels = clustered_vectors(n, dim, n_clusters, seed, spread)
    rows = [
        (int(i), [float(x) for x in v], int(c))
        for i, v, c in zip(ids, pts, labels)
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
