"""Embedding-distance data filtering: find outlier/bad crowdsourced clips.

Equivalent of reference embedding/distance_filtering.py: featurize ~50
training clips, k-means their 192-d embedding vectors (5 clusters), and sort
evaluation clips by L2 distance to the nearest centroid — far-away clips are
candidates for removal.

TPU-native differences: the embedding comes from the Flax model's named
`embed` method instead of Keras layer surgery at "dense_2"
(distance_filtering.py:12-27), and k-means is ~30 lines of JAX (kmeans++
seeding + Lloyd iterations under lax.fori_loop) instead of sklearn.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..train.evaluate import featurize_files


def make_embedding_fn(model, variables) -> Callable[[np.ndarray], np.ndarray]:
    """(B, 49, 40, 1) specs -> (B, 192) embeddings, jitted. `model` is a
    KWSEmbeddingModel or KWSTransferModel; both expose .embed."""
    emb = jax.jit(lambda s: model.apply(variables, s, method=model.embed))
    return lambda specs: np.asarray(emb(specs))


@partial(jax.jit, static_argnames=("n_clusters", "n_iters"))
def kmeans_fit(
    key, points: jnp.ndarray, n_clusters: int, n_iters: int = 50
) -> jnp.ndarray:
    """K-means on (N, D) points -> (K, D) centers. kmeans++ seeding, Lloyd
    updates; empty clusters keep their previous center."""
    n, dim = points.shape

    def seed_step(carry, key_i):
        centers, count = carry
        d2_all = jnp.sum((points[:, None] - centers[None]) ** 2, -1)  # (N, K)
        seeded = jnp.arange(n_clusters) < count  # (K,)
        d2 = jnp.min(jnp.where(seeded[None], d2_all, jnp.inf), axis=1)  # (N,)
        probs = d2 / jnp.maximum(d2.sum(), 1e-12)
        idx = jax.random.choice(key_i, n, p=probs)
        centers = centers.at[count].set(points[idx])
        return (centers, count + 1), None

    k0, key = jax.random.split(key)
    first = points[jax.random.randint(k0, (), 0, n)]
    centers0 = jnp.zeros((n_clusters, dim), points.dtype).at[0].set(first)
    if n_clusters > 1:
        (centers, _), _ = jax.lax.scan(
            seed_step, (centers0, 1), jax.random.split(key, n_clusters - 1)
        )
    else:
        centers = centers0

    def lloyd(_, centers):
        d2 = jnp.sum((points[:, None] - centers[None]) ** 2, -1)  # (N, K)
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, n_clusters, dtype=points.dtype)  # (N, K)
        counts = onehot.sum(0)  # (K,)
        sums = onehot.T @ points  # (K, D)
        new = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), centers
        )
        return new

    return jax.lax.fori_loop(0, n_iters, lloyd, centers)


def cluster_and_sort(
    keyword_samples: Sequence[str],
    embedding_fn: Callable[[np.ndarray], np.ndarray],
    seed: int = 123,
    n_train: int = 50,
    n_clusters: int = 5,
) -> Dict:
    """Reference cluster_and_sort (distance_filtering.py:30-83).

    Returns dict(sorted_clips, cluster_centers, distances, train_clips) with
    eval clips sorted ascending by L2 distance to the nearest center.
    """
    assert len(keyword_samples) > n_train, f"{n_train} > number of samples"
    rng = np.random.RandomState(seed)  # reference parity: RandomState perm
    kwdata = rng.permutation(np.asarray(keyword_samples, dtype=object))
    train_clips = kwdata[:n_train]
    eval_clips = kwdata[n_train:]

    train_specs = featurize_files(list(train_clips))[..., None]
    train_vecs = embedding_fn(train_specs)
    centers = np.asarray(
        kmeans_fit(jax.random.PRNGKey(seed), jnp.asarray(train_vecs), n_clusters)
    )

    eval_specs = featurize_files(list(eval_clips))[..., None]
    eval_vecs = embedding_fn(eval_specs)

    l2 = np.linalg.norm(centers[None] - eval_vecs[:, None], axis=-1)
    closest = l2.min(axis=1)
    order = np.argsort(closest)
    return dict(
        sorted_clips=eval_clips[order],
        cluster_centers=centers,
        distances=closest[order],
        train_clips=train_clips,
    )
