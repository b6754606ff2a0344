"""Neural networks as explicit param pytrees with pure ``apply`` functions.

No framework module system: params are dicts of arrays, created by
``init(key, ...)`` and consumed by ``apply(params, x)``; this keeps vmap
(over agents), jit, sharding annotations and checkpointing trivial.
Recurrent cells use single fused gate matmuls (MXU-friendly).
"""

from diral_tpu.models import qnets, recurrent, actor_critic
