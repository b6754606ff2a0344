"""Compute building blocks for the env engine: histograms, pairwise geometry.

Everything here is shape-static and vmap/jit friendly; the hot ops have
Pallas TPU kernel variants for large problem sizes (see pallas_kernels.py).
"""

from diral_tpu.ops.histogram import histogram_bin_indices, masked_count_histogram, masked_weighted_histogram
from diral_tpu.ops.distance import pairwise_distances, signed_dx
