"""Metric-record projection (SURVEY.md §2.2 M2/M3): the reference's
``NewMetric`` constructor (/root/reference/internal/metric/model/
metric_model.go:18-28 — uuid, Status=New) and status predicates
(metric_model.go:43-49) as vectorized batch transforms.

The uuid becomes a DETERMINISTIC row id (uuid5 of entity+ts+payload
hash) so re-executed tasks produce identical ids — required for
deterministic resume (SURVEY.md §7.5.3); the reference's random uuid4
would break replay idempotence."""

from __future__ import annotations

import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state.sketches import hash64

STATUS_NEW = 1  # metric_model.go:11-16
STATUS_PROCESSED = 2

_NAMESPACE = uuid.UUID("6ba7b810-9dad-11d1-80b4-00c04fd430c8")  # public DNS ns


def add_metric_columns(
    batch: pa.Table, entity_col: str, ts_col: str, payload_col: str | None = None
) -> pa.Table:
    """Append ``row_id`` (deterministic uuid5) and ``status``
    (STATUS_NEW) columns — the NewMetric projection."""
    h_entity = hash64(batch[entity_col])
    h_ts = hash64(batch[ts_col].cast(pa.int64()))
    mix = h_entity ^ (h_ts * np.uint64(0x9E3779B97F4A7C15))
    if payload_col is not None:
        mix = mix ^ hash64(batch[payload_col])
    ids = [str(uuid.uuid5(_NAMESPACE, f"{m:016x}")) for m in mix]
    out = batch.append_column("row_id", pa.array(ids, pa.string()))
    return out.append_column(
        "status",
        pa.array(np.full(len(batch), STATUS_NEW, dtype=np.uint8), pa.uint8()),
    )


def mark_processed(batch: pa.Table) -> pa.Table:
    """Status transition New→Processed (manager.go:420-422)."""
    i = batch.schema.get_field_index("status")
    return batch.set_column(
        i,
        "status",
        pa.array(np.full(len(batch), STATUS_PROCESSED, dtype=np.uint8), pa.uint8()),
    )


def is_new(batch: pa.Table) -> pa.Array:
    """IsNew predicate (metric_model.go:47-49)."""
    return pc.equal(batch["status"], pa.scalar(STATUS_NEW, pa.uint8()))


def is_processed(batch: pa.Table) -> pa.Array:
    """IsProcessed predicate (metric_model.go:43-45)."""
    return pc.equal(batch["status"], pa.scalar(STATUS_PROCESSED, pa.uint8()))
