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

Instead of bincount (a scatter), the histogram is an equality-expansion
contraction: ``one_hot(idx)[..., None] == arange(nbins)`` summed over the
item axis.  On TPU this lowers to a dense [items, bins] mask reduction that
the VPU eats; for the large-N configs a Pallas kernel fuses the distance
computation with the binning (ops/pallas_kernels.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def histogram_bin_indices(values, lo, hi, nbins: int):
    """Bin index per value, mirroring np.histogram's uniform fast path.

    Values are assumed inside [lo, hi] (callers gate validity separately);
    out-of-range values still get a clipped index -- mask them via ``valid``.
    """
    dtype = values.dtype
    edges = jnp.linspace(jnp.asarray(lo, dtype), jnp.asarray(hi, dtype), nbins + 1)
    f = (values - edges[0]) / (edges[-1] - edges[0]) * nbins
    idx = jnp.clip(f.astype(jnp.int32), 0, nbins)
    idx = jnp.where(idx == nbins, nbins - 1, idx)
    idx = jnp.where(values < edges[idx], idx - 1, idx)
    idx = jnp.clip(idx, 0, nbins - 1)
    bump = (values >= edges[jnp.clip(idx + 1, 0, nbins)]) & (idx != nbins - 1)
    idx = jnp.where(bump, idx + 1, idx)
    return idx


def masked_count_histogram(values, valid, lo, hi, nbins: int):
    """Count histogram of ``values[valid]`` over [lo, hi].

    values: [..., M] floats; valid: [..., M] bool.  Returns [..., nbins]
    in the values' dtype.
    """
    in_range = valid & (values >= lo) & (values <= hi)
    idx = histogram_bin_indices(values, lo, hi, nbins)
    onehot = (idx[..., None] == jnp.arange(nbins)) & in_range[..., None]
    return jnp.sum(onehot.astype(values.dtype), axis=-2)


def masked_weighted_histogram(values, weights, valid, lo, hi, nbins: int):
    """Weighted histogram (np.histogram with ``weights=``) of valid entries."""
    in_range = valid & (values >= lo) & (values <= hi)
    idx = histogram_bin_indices(values, lo, hi, nbins)
    onehot = (idx[..., None] == jnp.arange(nbins)) & in_range[..., None]
    return jnp.sum(onehot.astype(values.dtype) * weights[..., None], axis=-2)
