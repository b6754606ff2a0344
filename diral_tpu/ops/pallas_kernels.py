"""Pallas TPU kernels for the scale-path hot ops.

At the 100-vehicle / 8192-env scale (BASELINE configs[4]) the dominant env
cost is the view-based positional distribution: per (env, vehicle), fuse
table->distance geometry, the staleness/range gates, histogram binning and
count normalization (the XLA path materializes a [B, N, N, bins] expansion
for the bin compare; the kernel keeps everything for one vehicle row in
VMEM/registers and emits [N, bins] directly).

The kernel is written single-env on logical [N, N] shapes (Mosaic pads
tiles internally) and lifted over the env axis by ``vmap`` (which becomes
a grid dimension).
Binning uses the uniform floor rule with clipping -- within 1 ULP of
``np.histogram``'s edge-fixup path; the canonical XLA op
(ops/histogram.py) remains the bit-exact-parity implementation and the
kernel is the throughput path (see tests/test_pallas.py for equivalence on
random data).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STALENESS_CUTOFF = 20


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _piggy_hist_kernel(tx_ref, ty_ref, px_ref, py_ref, age_ref, out_ref, *,
                       n: int, nbins: int, bin_range: float):
    """One env: tables [N, N], positions [N, 1], ages [N, N] -> normalized
    histogram [N, nbins]; logical shapes, Mosaic pads internally."""
    np_, _ = tx_ref.shape
    px = px_ref[:, 0:1]                      # [Np, 1]
    py = py_ref[:, 0:1]
    dx = tx_ref[:] - px                      # [Np, Np]: row u = u's view
    dy = ty_ref[:] - py
    d = jnp.sqrt(dx * dx + dy * dy)
    sign = jnp.where(dx > 0.0, 1.0, -1.0).astype(d.dtype)
    signed = d * sign

    rows = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    valid = (
        (age_ref[:] < STALENESS_CUTOFF)
        & (rows != cols)
        & (d < bin_range)
        & (rows < n)
        & (cols < n)
    )

    # uniform binning over [-R, R] (floor rule, right edge closed)
    scale = nbins / (2.0 * bin_range)
    idx = jnp.floor((signed + bin_range) * scale).astype(jnp.int32)
    idx = jnp.clip(idx, 0, nbins - 1)

    cnt = jnp.sum(valid.astype(d.dtype), axis=1, keepdims=True)  # [Np, 1]
    inv = jnp.where(cnt > 0, 1.0 / jnp.where(cnt > 0, cnt, 1.0), 0.0)

    for b in range(nbins):
        hits = jnp.sum(
            (valid & (idx == b)).astype(d.dtype), axis=1, keepdims=True
        )
        out_ref[:, b:b + 1] = hits * inv
    # zero any padded bin columns
    for b in range(nbins, out_ref.shape[1]):
        out_ref[:, b:b + 1] = jnp.zeros((np_, 1), d.dtype)


def piggy_histogram(table_x, table_y, pos_x, pos_y, table_age,
                    bin_range: float, nbins: int):
    """Fused type-2 positional distribution (network.py:473-513 semantics).

    table_x/table_y: [N, N] stored positions, pos_x/pos_y: [N] live
    positions, table_age: [N, N] int32.  Returns [N, nbins] in the table
    dtype.  vmap over a leading env axis for batching."""
    # Logical (unpadded) shapes: Mosaic tiles/pads internally with masked
    # reductions, so the explicit [128, 128] padding round 2 did in XLA
    # (pad + slice per call) is pure overhead -- removed like the channel
    # kernel's (ops/pallas_step.py).
    n = table_x.shape[0]
    dtype = table_x.dtype

    kernel = functools.partial(
        _piggy_hist_kernel, n=n, nbins=nbins, bin_range=float(bin_range)
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, nbins), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(
        table_x, table_y, pos_x[:, None], pos_y[:, None], table_age,
    )
    return out
