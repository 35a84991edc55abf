"""Mergeable state: sketches (Welford/HLL/t-digest/histogram) and the
per-partition checkpoint manifest."""
