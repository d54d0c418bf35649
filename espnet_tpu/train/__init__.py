"""Training runtime: train step, trainer loop, reporter, checkpointing."""
