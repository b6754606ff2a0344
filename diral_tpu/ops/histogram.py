"""Fixed-range histogram ops that reproduce ``np.histogram``'s uniform-bin
fast path bit-for-bit (indices incl. the +-1 ULP edge fixups), expressed as
static-shape masked ops so they vectorize under jit/vmap.

The reference builds its view-based positional-distribution state with
``np.histogram`` (reference envs/network.py:460,500); bit-exact parity with
the NumPy oracle therefore requires the same index math:

    f = (x - lo) / (hi - lo) * nbins ; idx = int(f)
    idx == nbins        -> idx -= 1            (right edge closed)
    x < edges[idx]      -> idx -= 1            (ULP fixup)
    x >= edges[idx+1] and idx != nbins-1 -> idx += 1

(numpy.lib._histograms_impl.histogram, uniform-bins branch.)

Those fixups exist to make the float-derived index satisfy
``edges[idx] <= x < edges[idx+1]`` (last bin right-closed) against the
EXACT edge values -- i.e. the final index IS interval membership.  The
histogram ops therefore test membership directly: a dense
[items, bins] two-sided compare against the edge vector, summed over the
item axis (no scatter, no per-value ``edges[idx]`` gathers).  The
histogram fusion is the largest single op of the toy env step (~40% on
v5e); the membership form's simpler graph bought a measured +8% on the
engine headline with bit-identical outputs.
``histogram_bin_indices`` keeps the index form for callers that need
indices; both agree bit-for-bit (tests/test_env_properties.py pins the
equivalence on ULP-adjacent edge values).  For the large-N configs a
Pallas kernel fuses the distance computation with the binning
(ops/pallas_kernels.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def uniform_edges(lo, hi, nbins: int, dtype):
    """``np.linspace(lo, hi, nbins + 1)`` bit-for-bit, as a trace-time
    constant.

    ``jnp.linspace`` computes interior points with DIFFERENT float
    arithmetic than NumPy (e.g. f64 linspace(-500, 500, 21)[11] is
    50.00000000000003 under jnp but exactly 50.0 under np), which would
    put values that land exactly on a NumPy edge in the wrong bin.  The
    range bounds are always static Python scalars here (config values), so
    the exact NumPy edges are embedded directly -- also free at runtime."""
    import numpy as np

    return jnp.asarray(np.linspace(lo, hi, nbins + 1,
                                   dtype=np.dtype(jnp.dtype(dtype).name)))


def histogram_bin_indices(values, lo, hi, nbins: int):
    """Bin index per value, mirroring np.histogram's uniform fast path.

    Values are assumed inside [lo, hi] (callers gate validity separately);
    out-of-range values still get a clipped index -- mask them via ``valid``.
    """
    dtype = values.dtype
    edges = uniform_edges(lo, hi, nbins, dtype)
    f = (values - edges[0]) / (edges[-1] - edges[0]) * nbins
    idx = jnp.clip(f.astype(jnp.int32), 0, nbins)
    idx = jnp.where(idx == nbins, nbins - 1, idx)
    idx = jnp.where(values < edges[idx], idx - 1, idx)
    idx = jnp.clip(idx, 0, nbins - 1)
    bump = (values >= edges[jnp.clip(idx + 1, 0, nbins)]) & (idx != nbins - 1)
    idx = jnp.where(bump, idx + 1, idx)
    return idx


def bin_membership(values, lo, hi, nbins: int):
    """[..., M, nbins] bool: value lies in bin k, np.histogram semantics
    (right-open bins, last bin right-closed), by direct comparison against
    the exact ``linspace`` edge values.  Equals
    ``one_hot(histogram_bin_indices(values, ...))`` for in-range values
    (see module docstring) and is all-False for out-of-range ones."""
    dtype = values.dtype
    edges = uniform_edges(lo, hi, nbins, dtype)
    v = values[..., None]
    last = jnp.arange(nbins) == nbins - 1
    below_hi = jnp.where(last, v <= edges[1:], v < edges[1:])
    return (v >= edges[:-1]) & below_hi


def masked_count_histogram(values, valid, lo, hi, nbins: int):
    """Count histogram of ``values[valid]`` over [lo, hi].

    values: [..., M] floats; valid: [..., M] bool.  Returns [..., nbins]
    in the values' dtype.
    """
    member = bin_membership(values, lo, hi, nbins) & valid[..., None]
    return jnp.sum(member.astype(values.dtype), axis=-2)


def masked_weighted_histogram(values, weights, valid, lo, hi, nbins: int):
    """Weighted histogram (np.histogram with ``weights=``) of valid entries."""
    member = bin_membership(values, lo, hi, nbins) & valid[..., None]
    return jnp.sum(member.astype(values.dtype) * weights[..., None], axis=-2)
