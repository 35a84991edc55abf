"""End-to-end pipelines: the flagship validation run."""
