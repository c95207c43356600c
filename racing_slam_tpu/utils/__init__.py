"""Host-side utilities: video IO, synthetic data, metrics, checkpointing."""
