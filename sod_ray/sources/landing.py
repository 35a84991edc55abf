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
    """A directory of arriving parquet shards + a committed-file ledger."""

    def __init__(self, landing_dir: str, ledger_dir: str | None = None):
        self.landing_dir = landing_dir
        self.ledger_dir = ledger_dir or os.path.join(landing_dir, "_ledger")
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

    # -- polling --------------------------------------------------------

    def pending(self) -> list[str]:
        """New (uncommitted) shard filenames, sorted for determinism."""
        done = self.committed()
        files = [
            f
            for f in os.listdir(self.landing_dir)
            if f.endswith(".parquet") and not f.startswith("_") and f not in done
        ]
        return sorted(files)

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
