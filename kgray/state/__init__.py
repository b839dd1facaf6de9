"""Run state: lineage counters, checkpoint manifest, model artifacts."""
