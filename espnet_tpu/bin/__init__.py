"""CLI entry points (python -m espnet_tpu.bin.<tool>)."""
