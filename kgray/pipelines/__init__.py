"""End-to-end Dataset pipelines."""
