"""Continuous-loop soak (ROADMAP round-3 #3): a producer drops arrival
batches into the landing zone WHILE the incremental consumer loop runs;
mid-soak the consumer is SIGKILLed and restarted; poison shards (torn
footer, schema drift) and a dirty batch (30% null html) are injected.

Asserts, at the end:
  1. ledger == every healthy shard committed exactly once; both poison
     shards quarantined with the right reasons; no healthy shard lost.
  2. every run dir's manifest is complete (all partitions committed)
     and its verdict rows sum to exactly the rows of its input shards.
  3. the killed run resumed into the SAME run dir (content-hash run id)
     with partitions skipped, and re-validated rows match a clean run.
  4. the rolling baseline survives the kill and covers all 8 langs;
     runs after the first are drift-scored.
  5. the dirty batch's run reports all_passed=False via c_null_rate.

Usage: python tools/soak_incremental.py [n_batches=18]
"""
from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import threading
import time

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/sod_soak"
LANDING = f"{ROOT}/landing"
OUT = f"{ROOT}/out"
ROWS_PER_SHARD = 1000

CONSUMER_SNIPPET = """
import sys, json
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
import ray.data as rd
rd.DataContext.get_current().enable_progress_bars = False
from sod_ray.pipelines.incremental import run_incremental
from sod_ray.pipelines.validate import ValidateConfig
res = run_incremental(
    {landing!r}, {out!r}, ValidateConfig(partitions_per_wave=4),
    interval_s=0.3, max_empty_polls={max_empty!r}, quarantine_grace_s=2.0,
)
print("SUMMARY:" + json.dumps(res))
ray.shutdown()
"""


def write_batch(batch: int, dirty: bool = False) -> list[str]:
    """Two shards per arrival batch, write-then-rename. A dirty batch
    nulls out 30% of html (way past the 0.005 planted base rate)."""
    from sod_ray.sources.webpages import synth_shard

    names = []
    for k in range(2):
        shard_no = batch * 2 + k
        tbl, _ = synth_shard(ROWS_PER_SHARD, shard=shard_no, seed=11)
        if dirty:
            import numpy as np
            import pyarrow as pa

            rng = np.random.default_rng(shard_no)
            kill = rng.random(tbl.num_rows) < 0.30
            html = tbl["html"].to_pylist()
            for i in np.flatnonzero(kill):
                html[i] = None
            tbl = tbl.set_column(
                tbl.schema.get_field_index("html"), "html",
                pa.array(html, pa.binary()),
            )
        name = f"batch{batch:03d}-shard{k}.parquet"
        tmp = os.path.join(LANDING, f"_tmp-{name}")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(LANDING, name))
        names.append(name)
    return names


def write_poison() -> list[str]:
    """A torn file and a schema-drifted shard, backdated past grace."""
    import pyarrow as pa

    torn = os.path.join(LANDING, "poison-torn.parquet")
    with open(torn, "wb") as f:
        f.write(b"PAR1\x00not a real footer")
    drift = os.path.join(LANDING, "poison-drift.parquet")
    pq.write_table(
        pa.table({"url": pa.array(["u"]), "lang": pa.array(["en"])}), drift
    )
    past = time.time() - 60
    for p in (torn, drift):
        os.utime(p, (past, past))
    return ["poison-torn.parquet", "poison-drift.parquet"]


def start_consumer(max_empty: int = 8) -> subprocess.Popen:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = CONSUMER_SNIPPET.format(
        repo=repo, landing=LANDING, out=OUT, max_empty=max_empty
    )
    return subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,
    )


def finish_consumer(proc: subprocess.Popen) -> dict:
    out, _ = proc.communicate(timeout=900)
    assert proc.returncode == 0, f"consumer failed rc={proc.returncode}"
    for line in out.splitlines():
        if line.startswith("SUMMARY:"):
            return json.loads(line[len("SUMMARY:"):])
    raise AssertionError("no SUMMARY line from consumer")


def main(n_batches: int = 18):
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(LANDING, exist_ok=True)
    t_start = time.perf_counter()
    healthy: list[str] = []
    dirty_batch = n_batches - 3
    summaries: list[dict] = []

    # ---- phase A: producer thread races the consumer -------------------
    phase_a = list(range(0, n_batches // 2))

    def produce(batches):
        for b in batches:
            healthy.extend(write_batch(b, dirty=(b == dirty_batch)))
            time.sleep(2.0)

    prod = threading.Thread(target=produce, args=(phase_a,))
    consumer = start_consumer(max_empty=20)
    prod.start()
    prod.join()
    summaries.append(finish_consumer(consumer))
    n_runs_a = len(summaries[-1]["runs"])
    print(f"phase A: {n_runs_a} runs over {len(healthy)} shards "
          f"({sum(r['rows'] for r in summaries[-1]['runs'])} rows scanned)")
    assert n_runs_a >= 3, "producer pacing should yield multiple runs"

    # ---- phase B: poison + a big batch set, kill mid-validation --------
    poison = write_poison()
    phase_b = list(range(n_batches // 2, n_batches // 2 + n_batches // 4))
    for b in phase_b:
        healthy.extend(write_batch(b))
    victim = start_consumer(max_empty=10)
    # adaptive kill: the victim's first poll sees exactly the phase-B
    # shards; watch that run's manifest and strike right after the
    # first wave commits (mid-run, with partitions on disk to resume)
    from sod_ray.pipelines.incremental import _run_id

    files_b = sorted(
        f for b in phase_b
        for f in (f"batch{b:03d}-shard0.parquet", f"batch{b:03d}-shard1.parquet")
    )
    manifest_b = os.path.join(OUT, _run_id(files_b), "manifest")
    deadline = time.time() + 120
    while time.time() < deadline:
        if os.path.isdir(manifest_b) and any(
            p.startswith("part-") for p in os.listdir(manifest_b)
        ):
            break
        time.sleep(0.1)
    else:
        raise AssertionError("phase-B run never started committing")
    os.killpg(victim.pid, signal.SIGKILL)
    victim.wait()
    from sod_ray.sources.landing import LandingZone as _LZ

    uncommitted = [
        f for b in phase_b
        for f in (f"batch{b:03d}-shard0.parquet", f"batch{b:03d}-shard1.parquet")
        if f not in _LZ(LANDING).committed()
    ]
    assert uncommitted, "kill landed after full commit — nothing to resume; rerun"
    print(f"phase B: consumer SIGKILLed mid-run "
          f"({len(uncommitted)} shards left uncommitted)")

    # ledger must not contain the in-flight (uncommitted) shards' rows
    # twice after restart — the restarted consumer resumes the SAME run
    revived = start_consumer(max_empty=10)
    summaries.append(finish_consumer(revived))
    runs_b = summaries[-1]["runs"]
    print(f"phase B: restart completed {len(runs_b)} run(s); "
          f"resumed partitions: {[r['partitions_resumed'] for r in runs_b]}")
    assert any(r["partitions_resumed"] > 0 for r in runs_b) or len(runs_b) == 0, \
        "restart should resume the killed run's committed partitions"

    # ---- phase C: the tail batches including the dirty one -------------
    phase_c = list(range(n_batches // 2 + n_batches // 4, n_batches))

    def produce_c():
        for b in phase_c:
            healthy.extend(write_batch(b, dirty=(b == dirty_batch)))
            time.sleep(2.0)

    prod_c = threading.Thread(target=produce_c)
    consumer_c = start_consumer(max_empty=20)
    prod_c.start()
    prod_c.join()
    summaries.append(finish_consumer(consumer_c))
    print(f"phase C: {len(summaries[-1]['runs'])} runs")

    # ---- final consistency audit --------------------------------------
    from sod_ray.pipelines.validate import _load_verdicts
    from sod_ray.sources.landing import LandingZone

    lz = LandingZone(LANDING)
    committed = lz.committed()
    assert committed == set(healthy), (
        f"ledger mismatch: missing={set(healthy) - committed} "
        f"extra={committed - set(healthy)}"
    )
    q = lz.quarantined()
    assert set(q) == set(poison), f"quarantine mismatch: {q}"
    assert "unreadable" in q["poison-torn.parquet"]
    assert "missing columns" in q["poison-drift.parquet"]

    # every run dir: manifest complete, verdict rows == input rows
    all_runs = [r for s in summaries for r in s["runs"]]
    seen_files: list[str] = []
    import pandas as pd

    dirty_all_passed = None
    drift_scored_runs = 0
    for rec in all_runs:
        seen_files.extend(rec["files"])
        vd = _load_verdicts(rec["out_dir"]).to_pandas()
        n_in = sum(
            pq.read_metadata(os.path.join(LANDING, f)).num_rows
            for f in rec["files"]
        )
        assert vd["rows"].sum() == n_in, (
            f"{rec['run_id']}: verdict rows {vd['rows'].sum()} != input {n_in}"
        )
        manifest_dir = os.path.join(rec["out_dir"], "manifest")
        parts = [p for p in os.listdir(manifest_dir) if p.startswith("part-")]
        assert len(parts) >= len(vd) , f"{rec['run_id']}: manifest incomplete"
        if "c_drift" in vd.columns:
            drift_scored_runs += 1
        if any(f.startswith(f"batch{dirty_batch:03d}-") for f in rec["files"]):
            dirty_all_passed = rec["all_passed"]
            assert (vd["c_null_rate"] == "fail").any(), \
                "dirty batch must fail null_rate"
    assert sorted(seen_files) == sorted(healthy), (
        "every healthy shard validated exactly once across runs"
    )
    assert dirty_all_passed is False, "dirty batch's run must not pass"
    assert drift_scored_runs >= len(all_runs) - 1, (
        f"only {drift_scored_runs}/{len(all_runs)} runs drift-scored"
    )

    # rolling baseline: parses, covers all langs
    base = pd.read_parquet(os.path.join(OUT, "baseline.parquet"))
    langs = set(base["part_key"]) - {"__global__"}
    assert {"en", "zh", "es", "de", "fr", "ru", "ja", "other"} <= langs, langs

    print(json.dumps({
        "soak_ok": True,
        "batches": n_batches,
        "healthy_shards": len(healthy),
        "rows_total": len(healthy) * ROWS_PER_SHARD,
        "runs_total": len(all_runs),
        "quarantined": sorted(q),
        "dirty_run_all_passed": dirty_all_passed,
        "drift_scored_runs": drift_scored_runs,
        "wall_sec": round(time.perf_counter() - t_start, 1),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 18)
