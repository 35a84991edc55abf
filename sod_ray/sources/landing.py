"""Arrival-driven ingestion from a parquet landing zone — the batch
analog of the reference's SCRAPE pull loop (S3).

The reference polls target URLs on a ticker, decodes each response,
sorts by CreatedAt and feeds the collect path
(/root/reference/internal/scrape/scrape.go:105-130 ``Run`` ticker,
132-177 ``scrape``, 179-213 ``scrapping``). The Ray-Data-native
translation: producers drop parquet shards into a landing directory;
``LandingZone.poll()`` lists files, subtracts the committed ledger, and
returns a ``ray.data.Dataset`` over ONLY the new shards (a plain
``read_parquet`` over an explicit file list — the idiomatic
arrival-driven source; a custom Datasource subclass would just
re-implement parquet reading). ``commit()`` marks shards processed via
the same atomic write-then-rename ledger pattern as the partition
manifest, so a killed consumer re-reads only uncommitted shards
(at-least-once, like the reference's store→send→delete alerts).

``run_loop`` is the ticker: poll → callback → commit, every
``interval_s``, until ``max_polls`` or an empty-poll limit — usable as
a long-running ``ray job`` entry.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from collections.abc import Callable


class LandingZone:
    """A directory of arriving parquet shards + a committed-file ledger.

    Poison-shard safety: a shard whose parquet footer is unreadable or
    whose schema is missing ``expected_columns`` is QUARANTINED (a
    ``.quarantine`` ledger record with the reason) instead of being
    delivered — otherwise one torn or schema-drifted file would crash
    the consumer's ``read_parquet`` on every poll forever, wedging the
    whole loop (the reference's per-response decode errors are typed
    and non-fatal; this is the file-level analog). A file younger than
    ``quarantine_grace_s`` is skipped-but-not-quarantined, so a
    producer writing directly (no write-then-rename) gets one grace
    window to finish."""

    def __init__(
        self,
        landing_dir: str,
        ledger_dir: str | None = None,
        expected_columns: list[str] | None = None,
        quarantine_grace_s: float = 5.0,
    ):
        self.landing_dir = landing_dir
        self.ledger_dir = ledger_dir or os.path.join(landing_dir, "_ledger")
        self.expected_columns = list(expected_columns) if expected_columns else None
        self.quarantine_grace_s = quarantine_grace_s
        os.makedirs(self.ledger_dir, exist_ok=True)

    # -- ledger ---------------------------------------------------------

    def _ledger_path(self, fname: str) -> str:
        return os.path.join(self.ledger_dir, fname.replace("/", "_") + ".done")

    def committed(self) -> set[str]:
        out = set()
        for name in os.listdir(self.ledger_dir):
            if not name.endswith(".done"):
                continue
            try:
                with open(os.path.join(self.ledger_dir, name)) as f:
                    out.add(json.load(f)["file"])
            except (json.JSONDecodeError, KeyError, OSError):
                continue  # torn file → treat as uncommitted
        return out

    def commit(self, files: list[str]) -> None:
        """Atomically mark shards processed (write-then-rename)."""
        for fname in files:
            path = self._ledger_path(fname)
            fd, tmp = tempfile.mkstemp(dir=self.ledger_dir, suffix=".tmp")
            try:
                with os.fdopen(fd, "w") as f:
                    json.dump({"file": fname, "committed_at": time.time()}, f)
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp, path)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)

    def _quarantine_path(self, fname: str) -> str:
        return os.path.join(
            self.ledger_dir, fname.replace("/", "_") + ".quarantine"
        )

    def quarantined(self) -> dict[str, str]:
        """Quarantined shard filename → reason."""
        out = {}
        for name in os.listdir(self.ledger_dir):
            if not name.endswith(".quarantine"):
                continue
            try:
                with open(os.path.join(self.ledger_dir, name)) as f:
                    rec = json.load(f)
                    out[rec["file"]] = rec.get("reason", "")
            except (json.JSONDecodeError, KeyError, OSError):
                continue
        return out

    def _write_quarantine(self, fname: str, reason: str) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.ledger_dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(
                    {"file": fname, "reason": reason, "at": time.time()}, f
                )
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self._quarantine_path(fname))
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    # -- polling --------------------------------------------------------

    def pending(self) -> list[str]:
        """New (uncommitted, readable) shard filenames, sorted for
        determinism. Unreadable / schema-drifted shards past the grace
        window are quarantined as a side effect."""
        import pyarrow.parquet as pq

        done = self.committed()
        bad = set(self.quarantined())
        out = []
        for f in sorted(os.listdir(self.landing_dir)):
            if (
                not f.endswith(".parquet")
                or f.startswith("_")
                or f in done
                or f in bad
            ):
                continue
            path = os.path.join(self.landing_dir, f)
            reason = None
            try:
                names = set(pq.read_schema(path).names)
                if self.expected_columns:
                    missing = [c for c in self.expected_columns if c not in names]
                    if missing:
                        reason = f"missing columns: {missing}"
            except Exception as e:  # torn footer, not parquet, IO error
                reason = f"unreadable: {type(e).__name__}: {e}"
            if reason is None:
                out.append(f)
                continue
            try:
                age = time.time() - os.path.getmtime(path)
            except OSError:
                continue  # vanished between listdir and stat
            if age >= self.quarantine_grace_s:
                self._write_quarantine(f, reason)
            # inside the grace window: skip this poll, retry next one
        return out

    def poll(self, columns: list[str] | None = None):
        """Dataset over the new shards only (None when nothing new).
        Caller processes it, then ``commit(files)`` the returned list."""
        import ray.data as rd

        files = self.pending()
        if not files:
            return None, []
        paths = [os.path.join(self.landing_dir, f) for f in files]
        return rd.read_parquet(paths, columns=columns), files

    def run_loop(
        self,
        callback: Callable,
        interval_s: float = 1.0,
        max_polls: int | None = None,
        max_empty_polls: int | None = None,
        columns: list[str] | None = None,
    ) -> int:
        """The scrape ticker (scrape.go:105-130): poll, hand the new
        shards' Dataset to ``callback(ds, files)``, commit on success.
        Returns the number of shards processed. A callback exception
        leaves the shards uncommitted — the next poll retries them."""
        processed = 0
        polls = empty = 0
        while True:
            ds, files = self.poll(columns=columns)
            polls += 1
            if ds is None:
                empty += 1
                if max_empty_polls is not None and empty >= max_empty_polls:
                    return processed
            else:
                empty = 0
                callback(ds, files)
                self.commit(files)
                processed += len(files)
            if max_polls is not None and polls >= max_polls:
                return processed
            time.sleep(interval_s)
