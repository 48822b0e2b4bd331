"""Test-time feature control for the pix2pixHD netE path.

Rebuilds the reference's feature-map workflow (pix2pixHD
``encode_features.py`` / ``precompute_feature_maps.py`` +
``--use_encoded_image`` / ``--cluster_path`` in its test options,
SURVEY.md §2.2 netE row [C]):

1. **Precompute**: run netE over the training set, collect one pooled
   feature vector per instance (``collect_dataset_features`` — the
   on-device segment tables from ``nn.encoders.instance_feature_table``,
   no host loops over ``inst.unique()``);
2. **Cluster**: K-means the collected vectors into ``n_clusters``
   style centroids (plain numpy — tiny data, host-side like the
   reference's sklearn call);
3. **Sample**: at test time assign every instance in the test frame a
   randomly chosen centroid (``sample_feature_map`` — a static-shape
   gather through the hashed segment ids, jit-safe), giving controlled
   multi-modal outputs from one input.

ir2rgb conditions on real IR (label_nc=0), so clustering is global
rather than per-semantic-class — one centroid table, not one per label.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ir2rgb_tpu.nn.encoders import hash_instance_ids, instance_feature_table


def batch_instance_features(model, g_params, image: jax.Array,
                            inst: jax.Array) -> Tuple[np.ndarray,
                                                      np.ndarray]:
    """Pooled netE features for one batch: (B, num_instances, C) means
    and (B, num_instances) counts, on host."""
    enc = model.enc_cfg
    feat = model.encode_features(g_params, image, inst=None)
    means, cnts, _ = instance_feature_table(feat, inst, enc.num_instances)
    return np.asarray(means), np.asarray(cnts)


def collect_dataset_features(model, g_params, loader,
                             max_items: Optional[int] = None
                             ) -> np.ndarray:
    """One feature vector per (image, instance) over a dataset: encode
    each batch's REAL target image (the reference precompute encodes
    ground truth), pool per instance, keep populated segments.
    Returns (N, feat_num) float32."""
    out = []
    seen = 0
    for batch in loader:
        if "inst" not in batch:
            raise ValueError(
                "collect_dataset_features needs instance maps "
                "(<phase>Inst/ folder) — use_instance_feat datasets only")
        b = jnp.asarray(batch["b"], jnp.float32) / 127.5 - 1.0
        means, cnts = batch_instance_features(
            model, g_params, b, jnp.asarray(batch["inst"]))
        for i in range(means.shape[0]):
            out.append(means[i][cnts[i] > 0])
        seen += means.shape[0]
        if max_items is not None and seen >= max_items:
            break
    if not out:
        raise ValueError("dataset produced no instance features")
    return np.concatenate(out, axis=0).astype(np.float32)


def kmeans(x: np.ndarray, k: int, iters: int = 50,
           seed: int = 0) -> np.ndarray:
    """Plain-numpy K-means (k-means++ init). x: (N, C) -> (k', C)
    centers, k' = min(k, number of distinct points)."""
    x = np.asarray(x, np.float64)
    n = x.shape[0]
    rng = np.random.RandomState(seed)
    k = min(k, n)
    # k-means++ seeding
    centers = [x[rng.randint(n)]]
    for _ in range(1, k):
        d2 = np.min(
            ((x[:, None, :] - np.asarray(centers)[None]) ** 2).sum(-1),
            axis=1)
        total = d2.sum()
        if total <= 0:  # all remaining points coincide with a center
            break
        centers.append(x[rng.choice(n, p=d2 / total)])
    centers = np.asarray(centers)
    for _ in range(iters):
        assign = np.argmin(
            ((x[:, None, :] - centers[None]) ** 2).sum(-1), axis=1)
        new = np.array([
            x[assign == j].mean(0) if np.any(assign == j) else centers[j]
            for j in range(len(centers))])
        if np.allclose(new, centers):
            break
        centers = new
    return centers.astype(np.float32)


def save_clusters(path: str, centers: np.ndarray) -> None:
    np.savez(path, centers=np.asarray(centers, np.float32))


def load_clusters(path: str) -> np.ndarray:
    with np.load(path) as z:
        return np.asarray(z["centers"], np.float32)


def sample_feature_map(inst: jax.Array, centers: jax.Array,
                       key: jax.Array,
                       num_instances: int = 1024) -> jax.Array:
    """Assign every instance a random cluster centroid and broadcast it
    over the instance's pixels (the reference's sample_features).

    inst: (B, H, W) int ids; centers: (k, C). Static shapes: one random
    centroid index per hash segment, gathered back through the id map —
    an instance's pixels always agree, distinct instances draw
    independently (up to hash collisions, same caveat as training).
    Returns (B, H, W, C) float32.
    """
    b, h, w = inst.shape
    centers = jnp.asarray(centers, jnp.float32)
    k = centers.shape[0]
    ids = hash_instance_ids(inst.reshape(b, h * w), num_instances)
    choice = jax.random.randint(key, (b, num_instances), 0, k)
    per_segment = centers[choice]               # (B, num_instances, C)
    out = jax.vmap(lambda t, i: t[i])(per_segment, ids)
    return out.reshape(b, h, w, centers.shape[1])
