"""Webhook alert push sink — the reference's alert notifier (S6).

The reference buffers outlier Metrics per entity and, on a ticker,
persists each alert, POSTs gzip-aware JSON
``{entityId, data: [{norm, outlier, createdAt, extra}]}`` to the
entity's target, and deletes the stored alert on success — store→send→
delete at-least-once (/root/reference/internal/alert/alert.go:125-134
``Notify``, 171-232 notifier loop, 234-293 ``do``/``send``).

Ray translation: violation rows already land in the parquet sidecar
(the durable "store"); ``webhook_push`` is an OPTIONAL terminal
``map_batches`` actor stage that groups each batch by entity, POSTs one
JSON payload per entity group with bounded retry/backoff, and emits a
per-payload delivery record (entity, rows, status, attempts) — the
"send" half. Undelivered payloads stay in the emitted record stream
with ok=False; re-running the stage over the sidecar redelivers
(at-least-once, idempotency is the receiver's burden exactly as in the
reference).

The container has no network: the HTTP transport is injectable
(``transport(url, payload_bytes) -> int`` status), with a urllib
default for real deployments. Tests inject a fake.
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa


def _default_transport(url: str, payload: bytes) -> int:
    """urllib POST (gzip like the reference's client when beneficial).
    Only used in deployments with a reachable webhook target."""
    import urllib.request

    req = urllib.request.Request(
        url, data=payload, headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=10) as resp:  # noqa: S310
        return resp.status


class WebhookPush:
    """Actor-pool callable: per batch, one POST per entity group with
    retry. State (transport, target map) built once per actor."""

    def __init__(
        self,
        targets: dict[str, str] | str,
        entity_col: str = "lang",
        transport=None,
        max_retries: int = 3,
        backoff_s: float = 0.2,
    ):
        self.targets = targets
        self.entity_col = entity_col
        self.transport = transport or _default_transport
        self.max_retries = max_retries
        self.backoff_s = backoff_s

    def _target_for(self, entity: str) -> str | None:
        if isinstance(self.targets, str):
            return self.targets  # one target for all entities
        return self.targets.get(entity)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import time

        out = []
        for entity, g in batch.groupby(self.entity_col, dropna=False):
            url = self._target_for(entity)
            if url is None:
                out.append(
                    {
                        "entity": entity,
                        "rows": len(g),
                        "status": -1,
                        "attempts": 0,
                        "ok": False,
                        "error": "no target for entity",
                    }
                )
                continue
            payload = json.dumps(
                {
                    "entityId": str(entity),
                    "data": g.drop(columns=[self.entity_col]).to_dict("records"),
                },
                default=str,
            ).encode("utf-8")
            status, err = -1, None
            attempts = 0
            for attempt in range(self.max_retries):
                attempts = attempt + 1
                try:
                    status = self.transport(url, payload)
                    if 200 <= status < 300:
                        err = None
                        break
                    err = f"status {status}"
                except Exception as e:  # network errors retry
                    err = str(e)
                time.sleep(self.backoff_s * (2**attempt))
            out.append(
                {
                    "entity": entity,
                    "rows": len(g),
                    "status": status,
                    "attempts": attempts,
                    "ok": err is None,
                    "error": err or "",
                }
            )
        return pd.DataFrame(
            out, columns=["entity", "rows", "status", "attempts", "ok", "error"]
        )


def webhook_push(
    violations_ds,
    targets: dict[str, str] | str,
    entity_col: str = "lang",
    transport=None,
    max_retries: int = 3,
    backoff_s: float = 0.2,
    concurrency=(1, 4),
    batch_size: int = 1024,
):
    """Terminal delivery stage over a violations Dataset. Returns a
    Dataset of per-payload delivery records; ``ok == False`` rows are
    the redelivery worklist (re-run over the sidecar to retry —
    at-least-once like the reference's stored alerts)."""
    return violations_ds.map_batches(
        WebhookPush,
        fn_constructor_args=(targets,),
        fn_constructor_kwargs={
            "entity_col": entity_col,
            "transport": transport,
            "max_retries": max_retries,
            "backoff_s": backoff_s,
        },
        batch_format="pandas",
        concurrency=concurrency,
        batch_size=batch_size,
    )
