"""Scrape puller transport (S3 tail): the reference's pull-mode ingest
— GET + gunzip + decode the collect wire shape + per-response sort by
createdAt — with an injectable ``fetch(url) -> bytes`` transport,
mirroring the webhook sink's injectable-transport pattern
(stages/alertsink.py; reference /root/reference/internal/scrape/
scrape.go:132-213, config.go:8-28).

No network exists in this container, so there is no default HTTP
transport — callers inject one (tests use an in-memory dict). Gzip is
handled by payload sniff (magic ``1f 8b``), covering both
Content-Encoding:gzip responses and pre-gzipped files. Reference
quirk, documented not reproduced: scrape.go:151-156 assigns the gzip
reader with ``:=`` inside the switch case, shadowing the outer
``reader`` — a genuinely gzip-encoded 200 response would crash
``ReadAll(nil)`` in the reference; we implement the evident intent
(transparent gunzip) instead.

``scrape_targets`` is one pull wave (the body of the reference's
``scrapping(ctx)``): every target is fetched, decoded with the same
strict-parse/violation-row policy as the collect source, sorted by
createdAt within its response (scrape.go:201-203), and stamped with
the deterministic NewMetric projection. Periodic scheduling belongs to
the landing-zone loop (sources/landing.py / pipelines/incremental.py);
``scrape_to_landing`` bridges the two by landing each wave as a
JSON-lines shard the incremental pipeline ingests."""

from __future__ import annotations

import gzip
import json
import os
from typing import Callable

import pyarrow as pa

from .collect_json import _flatten_lines


def gunzip_if_needed(body: bytes) -> bytes:
    """Transparent gunzip by magic-byte sniff (1f 8b)."""
    if len(body) >= 2 and body[0] == 0x1F and body[1] == 0x8B:
        return gzip.decompress(body)
    return body


def _project(flat: pa.Table) -> pa.Table:
    """NewMetric projection + typed error rows — same policy as
    read_collect_json's project step."""
    import pyarrow.compute as pc

    from ..stages.metric import add_metric_columns

    ok_mask = pc.equal(flat["parse_error"], pa.scalar(""))
    ok = flat.filter(ok_mask)
    bad = flat.filter(pc.invert(ok_mask))
    if ok.num_rows:
        ok = add_metric_columns(ok, "entity_id", "created_at", "extra")
    else:
        ok = ok.append_column("row_id", pa.array([], pa.string()))
        ok = ok.append_column("status", pa.array([], pa.uint8()))
    bad = bad.append_column("row_id", pa.nulls(bad.num_rows, pa.string()))
    bad = bad.append_column("status", pa.nulls(bad.num_rows, pa.uint8()))
    return pa.concat_tables([ok, bad], promote_options="default")


def scrape_targets(
    targets: list[dict],
    fetch: Callable[[str], bytes],
) -> tuple[pa.Table, list[dict]]:
    """One pull wave over ``targets`` (``[{"url": ..., "entityId":
    ...}, ...]`` — the reference's SOD_SCRAPE_TARGET_URLS shape).

    Returns (metric rows, transport errors). Each target's response is
    gunzipped if needed and decoded as one collect-wire JSON object;
    the response's OWN ``entity`` field names the stream (the
    reference ignores the target's entityId at collect time,
    scrape.go:204). Rows sort by createdAt within their response;
    malformed payloads become ``parse_error`` rows, transport failures
    become error records — neither aborts the wave
    (scrape.go:186-189 logs and continues)."""
    tables, errors = [], []
    for t in targets:
        url = t["url"]
        try:
            body = gunzip_if_needed(fetch(url))
            text = body.decode("utf-8")
        except Exception as e:  # transport/encoding failure: skip target
            errors.append({"url": url, "error": f"{type(e).__name__}: {e}"})
            continue
        # one response == one collect request line
        tables.append(_flatten_lines([" ".join(text.splitlines())]))
    if not tables:
        flat = _flatten_lines([])
    else:
        flat = pa.concat_tables(tables, promote_options="default")
    return _project(flat), errors


def scrape_to_landing(
    targets: list[dict],
    fetch: Callable[[str], bytes],
    landing_dir: str,
    shard_name: str,
) -> tuple[str | None, list[dict]]:
    """Land one pull wave as a JSON-lines shard (collect wire format,
    one response per line) for the landing-zone/incremental loop.
    Written tmp+rename so the poll loop never sees a torn shard.
    Returns (shard path or None when every target failed, errors)."""
    lines, errors = [], []
    for t in targets:
        url = t["url"]
        try:
            body = gunzip_if_needed(fetch(url)).decode("utf-8")
            json.loads(body)  # landing shards carry only decodable lines
        except Exception as e:
            errors.append({"url": url, "error": f"{type(e).__name__}: {e}"})
            continue
        lines.append(" ".join(body.splitlines()))
    if not lines:
        return None, errors
    os.makedirs(landing_dir, exist_ok=True)
    path = os.path.join(landing_dir, shard_name)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)
    return path, errors
