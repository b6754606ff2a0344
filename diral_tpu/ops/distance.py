"""Pairwise vehicle geometry as dense [N, N] ops.

The reference computes distances pair-at-a-time in Python loops
(envs/network.py:318-332, 378-398); here the whole distance matrix is one
vectorized expression, which XLA fuses with downstream masking/reductions.
For N up to a few hundred the [B, N, N] tensors are the natural TPU layout;
beyond that the Pallas tiled variant takes over.
"""

from __future__ import annotations

import jax.numpy as jnp


def pairwise_distances(pos_x, pos_y):
    """D[i, j] = euclidean distance between vehicles i and j. [N] -> [N, N]."""
    dx = pos_x[:, None] - pos_x[None, :]
    dy = pos_y[:, None] - pos_y[None, :]
    return jnp.sqrt(dx * dx + dy * dy)


def signed_dx(pos_x):
    """sign[i, j] = +1 if j is strictly right of i else -1
    (reference network.py:334-349 ``dist_sign`` convention: the *other* user's
    x minus the reference user's x, > 0 -> +1)."""
    dx = pos_x[None, :] - pos_x[:, None]  # [i, j] = x_j - x_i
    return jnp.where(dx > 0.0, 1.0, -1.0).astype(pos_x.dtype)
