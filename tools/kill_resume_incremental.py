"""Kill/resume proof for the INCREMENTAL export loop
(pipelines/export.run_export_incremental): three landing waves with
cross-batch exact duplicates, SIGKILL the process group mid-wave-2,
rerun, and verify the final state (every batch corpus + the hash
index) is identical to an uninterrupted control run — the landing
ledger must not have committed the killed wave, the retry must land in
the SAME batch directory, and the cross-batch filter must not be
poisoned by a half-written index shard.

Usage: python tools/kill_resume_incremental.py [n_docs_per_wave] [kill_frac]
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import signal
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/sod_kill_inc"

VOCAB = np.array([f"word{i:04d}" for i in range(4000)])


def gen_wave(landing: str, wave: int, n: int, seed: int = 31) -> None:
    """Wave w: 60% fresh docs, 20% exact dups of wave w-1's fresh docs,
    10% quality-fail, 10% PII. Deterministic given (wave, n)."""
    rng = np.random.default_rng(seed * 1009 + wave)
    prev = np.random.default_rng(seed * 1009 + wave - 1) if wave else None
    base = wave * n
    ids = np.arange(base, base + n, dtype=np.int64)

    def body(r) -> str:
        nw = int(r.integers(60, 120))
        return " ".join(VOCAB[r.integers(0, len(VOCAB), nw)].tolist())

    # regenerate the PREVIOUS wave's fresh bodies so dups are exact
    prev_bodies: list[str] = []
    if prev is not None:
        for i in range(n):
            r = prev.random()
            b = body(prev) + f" marker{base - n + i}"
            if r < 0.6:
                prev_bodies.append(b)
    texts = []
    for i in range(n):
        r = rng.random()
        b = body(rng) + f" marker{base + i}"
        if r < 0.6:
            texts.append(b)
        elif r < 0.8 and prev_bodies:
            texts.append(prev_bodies[i % len(prev_bodies)])
        elif r < 0.9:
            texts.append("too short")
        else:
            texts.append(b + f" mail u{i}@example.org now")
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                np.array(["en", "de"])[ids % 2], pa.string()
            ),
        }
    )
    os.makedirs(landing, exist_ok=True)
    tmp = os.path.join(landing, f".wave-{wave}.tmp")
    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(landing, f"wave-{wave}.parquet"))


RUN_SNIPPET = """
import sys, json
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
import ray.data as rd
rd.DataContext.get_current().enable_progress_bars = False
from sod_ray.pipelines.export import CurateConfig, run_export_incremental
cfg = CurateConfig()
s = run_export_incremental({landing!r}, {out!r}, cfg, max_polls=1)
print("SUMMARY:" + json.dumps(s))
ray.shutdown()
"""


def run(landing: str, out: str, kill_after: float | None = None):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = RUN_SNIPPET.format(repo=repo, landing=landing, out=out)
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,
    )
    if kill_after is not None:
        time.sleep(kill_after)
        os.killpg(proc.pid, signal.SIGKILL)
        proc.wait()
        return None
    out_s, _ = proc.communicate(timeout=1200)
    assert proc.returncode == 0, f"run failed rc={proc.returncode}"
    for line in out_s.splitlines():
        if line.startswith("SUMMARY:"):
            return json.loads(line[len("SUMMARY:"):])
    raise AssertionError("no SUMMARY line")


def state_digest(out_root: str) -> dict:
    """(rows, md5) over the union of all batch corpora + index rows."""
    import pyarrow.dataset as pads

    corpora = sorted(
        os.path.join(out_root, d, "out", "corpus")
        for d in os.listdir(out_root)
        if d.startswith("batch-")
        and os.path.isdir(os.path.join(out_root, d, "out", "corpus"))
    )
    tabs = [
        pads.dataset(c, format="parquet", partitioning="hive").to_table(
            columns=["doc_id", "text"]
        )
        for c in corpora
    ]
    t = pa.concat_tables(tabs).sort_by("doc_id") if tabs else None
    h = hashlib.md5()
    n = 0
    if t is not None:
        n = t.num_rows
        h.update(t["doc_id"].to_numpy().tobytes())
        for s in t["text"].to_pylist():
            h.update(s.encode())
    idx = os.path.join(out_root, "hash_index")
    idx_rows = 0
    if os.path.isdir(idx) and os.listdir(idx):
        idx_rows = pads.dataset(idx, format="parquet").count_rows()
    return {"rows": n, "digest": h.hexdigest(), "index_rows": idx_rows}


def main(n: int = 30_000, kill_frac: float = 0.5) -> int:
    shutil.rmtree(ROOT, ignore_errors=True)
    land_c = f"{ROOT}/landing_clean"
    land_k = f"{ROOT}/landing_killed"
    out_c = f"{ROOT}/out_clean"
    out_k = f"{ROOT}/out_killed"

    # CONTROL: three waves, uninterrupted
    walls = []
    for w in range(3):
        gen_wave(land_c, w, n)
        t0 = time.perf_counter()
        s = run(land_c, out_c)
        walls.append(time.perf_counter() - t0)
        b = s["batches"][0]
        print(
            f"clean wave {w}: arrived {b['rows_arrived']} new {b['rows_new']} "
            f"out {b['rows_out']} index {s['index_rows']} ({walls[-1]:.1f}s)"
        )
    dig_c = state_digest(out_c)

    # KILLED: wave 0 clean, wave 1 SIGKILLed mid-flight then retried,
    # wave 2 clean
    gen_wave(land_k, 0, n)
    run(land_k, out_k)
    gen_wave(land_k, 1, n)
    kill_at = walls[1] * kill_frac
    print(f"SIGKILL wave 1 at {kill_at:.1f}s ...")
    run(land_k, out_k, kill_after=kill_at)
    s = run(land_k, out_k)  # retry
    print(f"retried wave 1: {json.dumps(s['batches'])}")
    gen_wave(land_k, 2, n)
    run(land_k, out_k)
    dig_k = state_digest(out_k)

    print(f"clean:  {json.dumps(dig_c)}")
    print(f"killed: {json.dumps(dig_k)}")
    ok = dig_c == dig_k
    print("IDENTICAL" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(
        main(
            int(sys.argv[1]) if len(sys.argv) > 1 else 30_000,
            float(sys.argv[2]) if len(sys.argv) > 2 else 0.5,
        )
    )
