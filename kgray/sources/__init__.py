"""Deterministic synthetic sources and read helpers."""
