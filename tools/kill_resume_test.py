"""Kill/resume proof for the checkpoint manifest (BASELINE.md
resumability criterion): start a validation run, SIGKILL the whole
process group mid-flight, rerun, and verify that (a) the committed
partitions from attempt 1 are skipped, (b) attempt 2 completes the
rest, (c) the final verdicts equal a clean single-shot run.

Usage: python tools/kill_resume_test.py
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WEB = "/tmp/sod_kill_test/web"
OUT = "/tmp/sod_kill_test/out"
OUT_CLEAN = "/tmp/sod_kill_test/out_clean"

RUN_SNIPPET = """
import sys, json
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
import ray.data as rd
rd.DataContext.get_current().enable_progress_bars = False
from sod_ray.pipelines.validate import ValidateConfig, run_validation
res = run_validation({web!r} + "/webpages", {out!r}, ValidateConfig(partitions_per_wave=2))
print("RAN:" + json.dumps(sorted(res.partitions_run)))
print("SKIPPED:" + json.dumps(sorted(res.partitions_skipped)))
ray.shutdown()
"""


def run(out_dir: str, kill_after: float | None = None):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = RUN_SNIPPET.format(repo=repo, web=WEB, out=out_dir)
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
    out, _ = proc.communicate(timeout=600)
    assert proc.returncode == 0, f"run failed rc={proc.returncode}"
    ran = skipped = None
    for line in out.splitlines():
        if line.startswith("RAN:"):
            ran = json.loads(line[4:])
        if line.startswith("SKIPPED:"):
            skipped = json.loads(line[8:])
    return ran, skipped


def main():
    from sod_ray.sources.webpages import write_webpages

    shutil.rmtree("/tmp/sod_kill_test", ignore_errors=True)
    os.makedirs(WEB, exist_ok=True)
    write_webpages(WEB, n_rows=200_000, n_shards=16, seed=42, with_refs=False)

    # clean single-shot run (the expected final state)
    clean_ran, _ = run(OUT_CLEAN)
    print(f"clean run partitions: {clean_ran}")

    # attempt 1: killed mid-flight (SIGKILL, no cleanup handlers)
    run(OUT, kill_after=13.0)
    committed_after_kill = sorted(
        f.split("part-")[1].split(".json")[0]
        for f in os.listdir(os.path.join(OUT, "manifest"))
        if f.startswith("part-")
    ) if os.path.isdir(os.path.join(OUT, "manifest")) else []
    print(f"committed at kill: {committed_after_kill}")

    # attempt 2: resume
    ran2, skipped2 = run(OUT)
    print(f"resume ran: {ran2}; skipped: {skipped2}")
    assert skipped2 == committed_after_kill, "resume must skip exactly the committed partitions"
    assert sorted(ran2 + skipped2) == clean_ran, "resume must complete the remainder"

    # verdict equality vs clean run
    import pandas as pd
    import glob
    import pyarrow.parquet as pq

    def verdicts(d):
        t = pd.concat(
            [pq.read_table(f).to_pandas() for f in sorted(glob.glob(f"{d}/verdicts-*.parquet"))]
        )
        return t.sort_values("partition").reset_index(drop=True)

    v1, v2 = verdicts(OUT_CLEAN), verdicts(OUT)
    pd.testing.assert_frame_equal(
        v1[["partition", "rows", "passed"]], v2[["partition", "rows", "passed"]]
    )
    print("OK: killed+resumed run matches the clean run "
          f"({len(committed_after_kill)} partitions were skipped on resume)")


if __name__ == "__main__":
    main()
