"""Training loops, checkpointing, metrics, and the CLI."""
