"""Chunked Lloyd k-means in pure JAX (jit-safe, static shapes, HBM-frugal).

Replaces the reference's host-side ``fast_pytorch_kmeans`` codebook re-init
(``/root/reference/models/modules.py:489-499``) with an on-device
implementation so the periodic re-init runs inside the jitted train step
under a ``lax.cond`` without host round-trips.

The assignment pass streams points in chunks (``lax.scan``) so the [N, K]
distance matrix is never materialized for the full 2e5-point reservoir;
per-cluster sums accumulate via ``segment_sum``.

Init: the first K points of a random permutation of the input (the reservoir
is itself a uniform subsample of latents, so this is random init).  Empty
clusters keep their previous centroid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_clusters", "iters", "chunk"))
def kmeans(points: jax.Array, key: jax.Array, n_clusters: int,
           iters: int = 10, chunk: int = 2048,
           n_valid: jax.Array | None = None) -> jax.Array:
    """points [N, D] -> centroids [n_clusters, D] (fp32).

    ``n_valid`` (traced int) marks only the first ``n_valid`` rows as real
    points (a partially-filled reservoir); init centroids are then sampled
    uniformly WITHOUT replacement from the valid prefix (distinct whenever
    n_valid >= n_clusters).
    """
    n, d = points.shape
    pts = points.astype(jnp.float32)
    if n_valid is None:
        perm = jax.random.permutation(key, n)
        init = pts[perm[:n_clusters]]
        if n < n_clusters:  # degenerate: tile points to fill
            reps = -(-n_clusters // n)
            init = jnp.tile(pts, (reps, 1))[:n_clusters]
        valid_n = jnp.ones((n,), bool)
    else:
        # WITHOUT replacement among the valid prefix (traced n_valid, so no
        # jnp.random.permutation slice): rank uniform keys, penalize invalid
        # rows past the top, take the K best.  With-replacement sampling
        # here seeded ~K²/2N duplicate centroids per re-init; duplicates
        # survive Lloyd (argmin ties pick the lower index, the twin keeps
        # count 0 and its position) and became permanently dead codes.
        # The reference's fast_pytorch_kmeans inits from a randperm.
        nv = jnp.maximum(n_valid, 1)
        score = jax.random.uniform(key, (n,)) + 2.0 * (jnp.arange(n) >= nv)
        _, idx = jax.lax.top_k(-score, n_clusters)    # K smallest scores
        # n_valid < K only: wrap unavoidable invalid picks onto valid rows
        idx = jnp.where(idx < nv, idx, idx % nv)
        init = pts[idx]
        valid_n = jnp.arange(n) < n_valid

    # pad to a chunk multiple; padded rows go to the overflow segment K
    pad = -n % chunk
    if pad:
        pts_p = jnp.concatenate([pts, jnp.zeros((pad, d), jnp.float32)], axis=0)
        valid = jnp.concatenate(
            [valid_n, jnp.zeros((pad,), bool)], axis=0)
    else:
        pts_p, valid = pts, valid_n
    n_chunks = pts_p.shape[0] // chunk
    pts_c = pts_p.reshape(n_chunks, chunk, d)
    valid_c = valid.reshape(n_chunks, chunk)
    pts_sq_c = jnp.sum(pts_c * pts_c, axis=-1, keepdims=True)

    def lloyd(centroids, _):
        c_sq = jnp.sum(centroids * centroids, axis=1)[None, :]

        def assign_chunk(carry, xs):
            sums, counts = carry
            p, p_sq, ok = xs
            dist = p_sq + c_sq - 2.0 * p @ centroids.T          # [chunk, K]
            a = jnp.argmin(dist, axis=1)
            a = jnp.where(ok, a, n_clusters)                    # overflow seg
            sums = sums + jax.ops.segment_sum(p, a, n_clusters + 1)
            counts = counts + jax.ops.segment_sum(
                jnp.ones((chunk,), jnp.float32), a, n_clusters + 1)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            assign_chunk,
            (jnp.zeros((n_clusters + 1, d), jnp.float32),
             jnp.zeros((n_clusters + 1,), jnp.float32)),
            (pts_c, pts_sq_c, valid_c))
        sums, counts = sums[:n_clusters], counts[:n_clusters]
        new = jnp.where(counts[:, None] > 0,
                        sums / jnp.maximum(counts[:, None], 1.0),
                        centroids)
        return new, None

    centroids, _ = jax.lax.scan(lloyd, init, None, length=iters)
    return centroids
