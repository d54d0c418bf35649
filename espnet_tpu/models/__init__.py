"""Neural network modules (flax.linen) — attention, conformer, models."""
