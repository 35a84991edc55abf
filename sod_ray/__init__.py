"""sod_ray — a Ray-Data-native schema + constraint validation engine.

Built from scratch with the query/data-processing capabilities of the
reference engine (robotomize/sod, a Go streaming LOF outlier-detection
service) generalized into a per-partition data-quality pass over Parquet
tables of Common-Crawl-style web pages:

- per-column streaming statistics (Welford mean/variance, min/max,
  null/NaN counts) computed per Arrow batch and merged per partition,
- quantile (t-digest) and uniqueness (HyperLogLog) sketches,
- constraint checks: schema/type/null, uniqueness, referential
  containment, distribution drift (PSI / KS),
- a windowed outlier scorer (z-score peaks + bug-for-bug LOF replicating
  the reference's /root/reference/internal/predictor/lof/lof.go),
- violation-row sidecar output + per-partition lineage manifest for
  resumable runs.

Everything executes as ``ray.data.Dataset`` pipelines: ``map_batches``
over zero-copy Arrow batches, actor pools for stateful stages,
``groupby`` shuffles only for the sketch/verdict merges.
"""

__version__ = "0.1.0"
