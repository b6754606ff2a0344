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


# ---------------------------------------------------------------------------
# Envs-in-lanes piggy type-2 histogram (small-N configs)
# ---------------------------------------------------------------------------
#
# The toy config's positional histogram works on [B, N, N] tensors with
# N = 4: every XLA formulation puts (N, bins) or (N, N) in the trailing
# tile dims and wastes >= 87% of each (8, 128) tile on padding -- the
# round-3 trace measured the histogram fusion at ~42% of the whole env
# step.  This kernel packs E = 128 // (N*N) ENVS into the 128-lane axis
# (rows [B/E, E*N*N], dense), tests bin membership against the exact
# np.linspace edge constants (same compares as ops/histogram.py
# bin_membership), and reduces the neighbor axis with a 0/1 selection
# matmul on the MXU -- products and sums are small integers, exact in
# bf16, so the counts are BIT-identical to the XLA path.

def _lanes_hist_kernel(sd_ref, va_ref, sel_ref, hist_ref, cnt_ref, *,
                       edges, en_out: int):
    f32 = jnp.float32
    sd = sd_ref[:]                    # [Bt, E*N*N] signed distances
    va = va_ref[:]                    # [Bt, E*N*N] validity as 0/1 f32
    sel = sel_ref[:].astype(jnp.bfloat16)  # [E*N*N, E*N] 0/1 selection

    def reduce_neighbors(m):
        # 0/1 x 0/1 with f32 accumulation: exact for counts <= N
        return jax.lax.dot_general(
            m.astype(jnp.bfloat16), sel,
            (((1,), (0,)), ((), ())), preferred_element_type=f32)

    cnt_ref[:] = reduce_neighbors(va)
    nbins = len(edges) - 1
    for k in range(nbins):            # bins are few (toy: 20): unrolled
        lo = f32(edges[k])
        hi = f32(edges[k + 1])
        up = (sd <= hi) if k == nbins - 1 else (sd < hi)
        memb = (sd >= lo) & up
        hist_ref[:, k * en_out:(k + 1) * en_out] = reduce_neighbors(
            jnp.where(memb, va, 0.0))


def piggy_histogram_lanes(signed, valid, n: int, nbins: int,
                          lo: float, hi: float):
    """Batched piggy type-2 count histogram via env-lane packing.

    signed: [B, N*N] f32 signed distances (row b = env b's [N, N] table
    flattened); valid: [B, N*N] bool/0-1.  Returns (hist [B, N, nbins],
    cnt [B, N]) with np.histogram membership semantics -- bit-identical
    to ops/histogram.masked_count_histogram on the same inputs.
    Requires N*N <= 128."""
    import numpy as np

    B = signed.shape[0]
    nn = n * n
    E = max(1, 128 // nn)
    en_out = E * n
    # the exact np.linspace edges (ops/histogram.uniform_edges semantics;
    # computed in numpy directly so tracing never touches a jnp constant)
    edges = tuple(float(v) for v in np.linspace(
        lo, hi, nbins + 1, dtype=np.dtype(jnp.dtype(signed.dtype).name)))

    Bp = _round_up(B, E)
    if Bp != B:
        signed = jnp.pad(signed, ((0, Bp - B), (0, 0)))
        valid = jnp.pad(valid, ((0, Bp - B), (0, 0)))
    R = Bp // E
    sd = signed.reshape(R, E * nn)
    va = valid.astype(signed.dtype).reshape(R, E * nn)

    # selection matrix: lane (e, n, m) -> column (e, n)
    sel = np.zeros((E * nn, en_out), np.float32)
    for e in range(E):
        for u in range(n):
            sel[e * nn + u * n:e * nn + u * n + n, e * n + u] = 1.0
    sel = jnp.asarray(sel, signed.dtype)

    bt = min(256, _round_up(R, 8))
    Rp = _round_up(R, bt)
    if Rp != R:
        sd = jnp.pad(sd, ((0, Rp - R), (0, 0)))
        va = jnp.pad(va, ((0, Rp - R), (0, 0)))

    kernel = functools.partial(_lanes_hist_kernel, edges=edges,
                               en_out=en_out)
    hist, cnt = pl.pallas_call(
        kernel,
        grid=(Rp // bt,),
        in_specs=[
            pl.BlockSpec((bt, E * nn), lambda ib: (ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, E * nn), lambda ib: (ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E * nn, en_out), lambda ib: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, nbins * en_out), lambda ib: (ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, en_out), lambda ib: (ib, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Rp, nbins * en_out), signed.dtype),
            jax.ShapeDtypeStruct((Rp, en_out), signed.dtype),
        ],
        interpret=jax.default_backend() != "tpu",
    )(sd, va, sel)
    # [R, nbins, E, N] -> [Bp, N, nbins]
    hist = hist[:R].reshape(R, nbins, E, n).transpose(0, 2, 3, 1)
    hist = hist.reshape(Bp, n, nbins)[:B]
    cnt = cnt[:R].reshape(Bp, n)[:B]
    return hist, cnt
