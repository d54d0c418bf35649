"""Mesh construction + sharding rules (data/tensor parallel via GSPMD)."""
