"""Lloyd's k-means for codebook initialization, as a jit-able JAX routine.

Parity target: ``/root/reference/genrec/modules/kmeans.py`` (``Kmeans.run``
:78-99, ``_update_centroids`` :58-76, ``kmeans_init_`` :11-25): random-sample
init, empty-cluster reseed with a random point, stop threshold on max centroid
movement. TPU-first redesign: the reference's data-dependent ``while`` + Python
per-cluster loop becomes a ``lax.while_loop`` over fully vectorized
assignment/update steps (segment-sum instead of a K-way Python loop), so the
whole init compiles into the warmup step instead of running op-by-op.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class KmeansOutput(NamedTuple):
    centroids: jnp.ndarray   # (k, D)
    assignment: jnp.ndarray  # (B,)


def _assign(x: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over c (MXU matmul).
    x2 = jnp.sum(jnp.square(x), axis=1, keepdims=True)
    c2 = jnp.sum(jnp.square(centroids), axis=1)[None, :]
    xc = jnp.dot(x, centroids.T, preferred_element_type=jnp.float32)
    return jnp.argmin(x2 - 2.0 * xc + c2, axis=1)


def _kmeanspp_init(key: jax.Array, x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-means++ seeding: sample each next centroid ∝ min squared distance.

    Deviates from the reference's uniform random-sample init
    (``modules/kmeans.py:51-56``) — ++ seeding avoids the split/merged-
    cluster local optima uniform init falls into, which matters for 256-way
    codebook quality. Fully jit-able (lax.scan over k draws).
    """
    B, D = x.shape
    first_key, scan_key = jax.random.split(key)
    first = x[jax.random.randint(first_key, (), 0, B)]
    d0 = jnp.sum(jnp.square(x - first), axis=1)

    def draw(carry, step_key):
        min_d = carry
        logits = jnp.log(jnp.maximum(min_d, 1e-12))
        idx = jax.random.categorical(step_key, logits)
        c = x[idx]
        min_d = jnp.minimum(min_d, jnp.sum(jnp.square(x - c), axis=1))
        return min_d, c

    _, rest = jax.lax.scan(draw, d0, jax.random.split(scan_key, k - 1))
    return jnp.concatenate([first[None], rest], axis=0)


def kmeans(key: jax.Array, x: jnp.ndarray, k: int,
           max_iters: int = 100, stop_threshold: float = 1e-10,
           init: str = "kmeans++") -> KmeansOutput:
    """Run Lloyd's algorithm on ``x`` (B, D) with ``k`` clusters.

    Unlike the reference (unbounded ``while``), iterations are capped at
    ``max_iters`` (static) with the same movement-based early stop, keeping the
    computation jit-compatible. ``init="random"`` reproduces the reference's
    uniform sample-without-replacement seeding (``modules/kmeans.py:51-56``)
    for collision-rate A/Bs; the default stays k-means++.
    """
    B, D = x.shape
    x = x.astype(jnp.float32)
    init_key, reseed_key = jax.random.split(key)
    if init == "random":
        idx = jax.random.choice(init_key, B, (k,), replace=False)
        centroids0 = x[idx]
    else:
        centroids0 = _kmeanspp_init(init_key, x, k)

    def step(carry):
        centroids, _, it, _ = carry
        assignment = _assign(x, centroids)
        counts = jnp.zeros((k,), jnp.float32).at[assignment].add(1.0)
        sums = jnp.zeros((k, D), jnp.float32).at[assignment].add(x)
        means = sums / jnp.maximum(counts, 1.0)[:, None]
        # empty clusters: reseed from random data points (fresh key per iter)
        rk = jax.random.fold_in(reseed_key, it)
        rand_idx = jax.random.randint(rk, (k,), 0, B)
        new_centroids = jnp.where((counts > 0)[:, None], means, x[rand_idx])
        moved = jnp.max(jnp.linalg.norm(new_centroids - centroids, axis=1))
        return new_centroids, assignment, it + 1, moved

    def cond(carry):
        _, _, it, moved = carry
        return jnp.logical_and(it < max_iters, moved >= stop_threshold)

    carry0 = (centroids0, jnp.zeros((B,), jnp.int32), jnp.int32(0),
              jnp.float32(jnp.inf))
    centroids, assignment, _, _ = jax.lax.while_loop(cond, step, carry0)
    return KmeansOutput(centroids=centroids, assignment=assignment)
