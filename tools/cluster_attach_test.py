"""Validate the ``ray job submit`` execution model end to end minus
the HTTP job server (this container has no dashboard, which is where
Ray's job server lives): start a real ``ray start --head`` cluster,
run ``python -m sod_ray`` as a SUBPROCESS that attaches to it
(``RAY_ADDRESS=auto``, no --num-cpus → the CLI's guarded ``ray.init()``
joins the existing cluster instead of creating a local one), and
assert the run produced the exact planted truth. This is the path a
multi-node deployment exercises: the cluster exists first, the driver
is just a client.

Usage: python tools/cluster_attach_test.py
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ROWS = 20_000
PLANTED_DANGLING = N_ROWS // 10 // 100  # gen_web/webpages convention


def main() -> int:
    work = "/tmp/cluster_attach"
    shutil.rmtree(work, ignore_errors=True)

    from sod_ray.sources.webpages import write_webpages

    write_webpages(f"{work}/web", n_rows=N_ROWS, n_shards=4, seed=7)

    env = dict(os.environ, RAY_ADDRESS="")
    subprocess.run(
        ["ray", "stop"], env=env, capture_output=True, check=False
    )
    subprocess.run(
        [
            "ray", "start", "--head", "--num-cpus", "8",
            "--include-dashboard=false", "--disable-usage-stats",
        ],
        env=env,
        capture_output=True,
        check=True,
    )
    try:
        # the job-submit shape: driver subprocess attaches to the
        # pre-existing cluster (RAY_ADDRESS=auto) — the CLI must NOT
        # spin up its own local Ray
        out = subprocess.run(
            [sys.executable, "-m", "sod_ray",
             "--input", f"{work}/web/webpages",
             "--out", f"{work}/out",
             "--refs", f"{work}/web/webpage_refs"],
            env=dict(os.environ, RAY_ADDRESS="auto", PYTHONPATH=REPO),
            capture_output=True,
            text=True,
            check=False,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        assert lines, f"no JSON summary in CLI output:\n{out.stdout[-2000:]}"
        summary = json.loads(lines[-1])
        assert summary["rows_scanned"] == N_ROWS, summary
        assert summary["partitions_run"] == 8, summary
        ref_line = [
            l for l in out.stdout.splitlines() if l.startswith("referential:")
        ]
        assert ref_line and f"'n_dangling': {PLANTED_DANGLING}" in ref_line[0], (
            ref_line
        )
        print(json.dumps({
            "cluster_attach": "ok",
            "rows_scanned": summary["rows_scanned"],
            "partitions_run": summary["partitions_run"],
            "n_dangling": PLANTED_DANGLING,
        }))
        return 0
    finally:
        subprocess.run(
            ["ray", "stop"], env=env, capture_output=True, check=False
        )
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
