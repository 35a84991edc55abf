"""The reference's COLLECT wire format as a Ray Data source (S1/M1).

The reference ingests HTTP POST bodies shaped
``{"entity": str, "data": [{"vector": [f64...], "extra": {...},
"createdAt": RFC3339}]}`` (/root/reference/internal/collect/
handler.go:20-27), strictly decoded with typed errors
(/root/reference/internal/httputil/util.go:15-37), each batch sorted
by createdAt before processing (handler.go:75-77).

Batch translation: the same payloads as JSON-lines files in a landing
directory. ``read_collect_json`` parses each line inside
``map_batches`` (stdlib json — the strict-decode analog), flattens the
per-request ``data`` array into one row per point, sorts WITHIN each
request by createdAt (the reference's per-batch sort; cross-request
order is the file order, as in the reference's arrival order), and
appends the deterministic metric projection (row_id uuid5 +
status=New, stages/metric.py). Malformed lines or items do NOT crash
the pipeline — they surface as rows with a non-empty ``parse_error``
(the M1 malformed-row-as-violation policy) carrying the raw line.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa


def _flatten_lines(lines: list[str]) -> pa.Table:
    rows = []
    for line in lines:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            entity = req["entity"]
            data = req["data"]
            if not isinstance(entity, str) or not isinstance(data, list):
                raise TypeError("entity must be str, data must be list")
        except (json.JSONDecodeError, KeyError, TypeError) as e:
            rows.append(
                {
                    "entity_id": None,
                    "vector": None,
                    "created_at": None,
                    "extra": None,
                    "parse_error": f"{type(e).__name__}: {e}",
                    "raw": line[:1024],
                }
            )
            continue
        item_rows = []
        for item in data:
            try:
                vec = [float(x) for x in item["vector"]]
                ts = pd.Timestamp(item["createdAt"])
                if ts.tzinfo is not None:
                    ts = ts.tz_convert("UTC").tz_localize(None)
                item_rows.append(
                    {
                        "entity_id": entity,
                        "vector": vec,
                        "created_at": ts,
                        "extra": json.dumps(item.get("extra"), sort_keys=True)
                        if item.get("extra") is not None
                        else None,
                        "parse_error": "",
                        "raw": None,
                    }
                )
            except (KeyError, TypeError, ValueError) as e:
                item_rows.append(
                    {
                        "entity_id": entity,
                        "vector": None,
                        "created_at": None,
                        "extra": None,
                        "parse_error": f"{type(e).__name__}: {e}",
                        "raw": json.dumps(item)[:1024],
                    }
                )
        # the reference sorts each request's batch by CreatedAt before
        # processing (handler.go:75-77); errors keep arrival position
        ok = [r for r in item_rows if not r["parse_error"]]
        bad = [r for r in item_rows if r["parse_error"]]
        ok.sort(key=lambda r: r["created_at"])
        rows.extend(ok + bad)
    # explicit Arrow schema: a pandas object column mixing lists and
    # None round-trips unreliably through block conversion
    return pa.table(
        {
            "entity_id": pa.array([r["entity_id"] for r in rows], pa.string()),
            "vector": pa.array(
                [r["vector"] for r in rows], pa.list_(pa.float64())
            ),
            "created_at": pa.array(
                [r["created_at"] for r in rows], pa.timestamp("us")
            ),
            "extra": pa.array([r["extra"] for r in rows], pa.string()),
            "parse_error": pa.array(
                [r["parse_error"] for r in rows], pa.string()
            ),
            "raw": pa.array([r["raw"] for r in rows], pa.string()),
        }
    )


def read_collect_json(path: str):
    """Dataset of flattened metric rows from collect-payload JSON-lines
    files (one request per line). Valid rows get the deterministic
    NewMetric projection (row_id, status); error rows carry
    ``parse_error`` + the offending raw text."""
    import ray.data as rd

    from ..stages.metric import add_metric_columns

    lines = rd.read_text(path)

    def to_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return _flatten_lines(batch["text"].tolist())

    flat = lines.map_batches(to_rows, batch_format="pandas")

    def project(t: pa.Table) -> pa.Table:
        ok_mask = pa.compute.equal(t["parse_error"], pa.scalar(""))
        ok = t.filter(ok_mask)
        bad = t.filter(pa.compute.invert(ok_mask))
        if ok.num_rows:
            ok = add_metric_columns(ok, "entity_id", "created_at", "extra")
        else:
            ok = ok.append_column("row_id", pa.array([], pa.string()))
            ok = ok.append_column("status", pa.array([], pa.uint8()))
        bad = bad.append_column(
            "row_id", pa.nulls(bad.num_rows, pa.string())
        )
        bad = bad.append_column("status", pa.nulls(bad.num_rows, pa.uint8()))
        return pa.concat_tables([ok, bad], promote_options="default")

    return flat.map_batches(project, batch_format="pyarrow")
