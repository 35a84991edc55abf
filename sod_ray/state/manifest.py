"""Per-partition checkpoint manifest — the engine's resumability story.

Replaces the reference's full-DB replay recovery
(/root/reference/internal/dispatcher/manager.go:311-354 ``bulkLoad``)
with an explicit batch-pipeline checkpoint: after a partition's outputs
land, one JSON lineage record is committed via write-to-temp + atomic
rename. A resumed run lists committed partitions and filters them out
of the input before any data is read — no rescanning.

Record fields (SURVEY.md §4 "Checkpoint / resume"): partition key, rows
scanned, violation counts, constraint outcomes, output paths, sketch
byte sizes, commit flag. Records are self-contained files, one per
partition, so concurrent writers never contend and a partially-written
record is invisible (rename is atomic on POSIX).
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import asdict, dataclass, field


def _is_flag(v) -> bool:
    """True for genuine pass/fail markers; numeric evidence values
    (counts, estimates) must never be mistaken for flags (1 == True in
    Python, so a naive membership test would treat n_dangling=1 as a
    pass)."""
    return (isinstance(v, str) and v in ("pass", "fail")) or isinstance(v, bool)


@dataclass
class PartitionRecord:
    partition: str
    rows_scanned: int = 0
    rows_violating: int = 0
    constraint_outcomes: dict = field(default_factory=dict)  # name -> pass/fail
    outputs: list = field(default_factory=list)  # written file/dir paths
    sketch_bytes: int = 0
    committed: bool = True
    evidence: dict = field(default_factory=dict)  # numeric evidence, NOT flags

    def passed(self) -> bool:
        return all(
            v in ("pass", True)
            for v in self.constraint_outcomes.values()
            if _is_flag(v)
        )


class Manifest:
    """Directory of `part-<key>.json` records."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, partition: str) -> str:
        safe = partition.replace("/", "_").replace("=", "-")
        return os.path.join(self.root, f"part-{safe}.json")

    def commit(self, rec: PartitionRecord) -> str:
        """Atomic write-then-rename commit of one partition record."""
        path = self._path(rec.partition)
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(asdict(rec), f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)  # atomic on POSIX
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        return path

    def committed_partitions(self) -> set[str]:
        out = set()
        for name in os.listdir(self.root):
            if not (name.startswith("part-") and name.endswith(".json")):
                continue
            try:
                with open(os.path.join(self.root, name)) as f:
                    rec = json.load(f)
                if rec.get("committed"):
                    out.add(rec["partition"])
            except (json.JSONDecodeError, KeyError, OSError):
                continue  # torn/foreign file → treat as uncommitted
        return out

    def load(self, partition: str) -> PartitionRecord | None:
        path = self._path(partition)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return PartitionRecord(**json.load(f))

    def remaining(self, all_partitions) -> list[str]:
        done = self.committed_partitions()
        return [p for p in all_partitions if p not in done]

    def summary(self) -> dict:
        recs = []
        for name in sorted(os.listdir(self.root)):
            if name.startswith("part-") and name.endswith(".json"):
                try:
                    with open(os.path.join(self.root, name)) as f:
                        recs.append(json.load(f))
                except (json.JSONDecodeError, OSError):
                    continue
        return {
            "partitions": len(recs),
            "rows_scanned": sum(r.get("rows_scanned", 0) for r in recs),
            "rows_violating": sum(r.get("rows_violating", 0) for r in recs),
            "all_passed": all(
                all(
                    v in ("pass", True)
                    for v in r.get("constraint_outcomes", {}).values()
                    if _is_flag(v)
                )
                for r in recs
            ),
        }
