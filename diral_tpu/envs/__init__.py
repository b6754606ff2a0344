"""Environment engines: NumPy oracle (semantic ground truth) and batched JAX env."""
