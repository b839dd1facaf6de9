"""Deterministic scalar/vectorized helper functions (no Ray)."""
