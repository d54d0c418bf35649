"""Utilities: config, metrics, logging."""
