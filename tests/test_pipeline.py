"""End-to-end flagship validation pipeline + manifest resume."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from sod_ray.sources.webpages import write_webpages
from sod_ray.state.manifest import Manifest, PartitionRecord


@pytest.fixture(scope="module")
def web_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("web"))
    truth = write_webpages(d, n_rows=4000, n_shards=2, seed=42)
    return d, truth


def test_manifest_roundtrip(tmp_path):
    m = Manifest(str(tmp_path / "mani"))
    rec = PartitionRecord(
        partition="en",
        rows_scanned=100,
        rows_violating=3,
        constraint_outcomes={"nulls": "pass", "uniq": "fail"},
        outputs=["/tmp/x"],
    )
    m.commit(rec)
    assert m.committed_partitions() == {"en"}
    got = m.load("en")
    assert got.rows_scanned == 100
    assert not got.passed()
    assert m.remaining(["en", "de"]) == ["de"]
    s = m.summary()
    assert s["rows_scanned"] == 100 and not s["all_passed"]


def test_full_run_and_resume(ray_session, web_dir, tmp_path):
    from sod_ray.pipelines.validate import ValidateConfig, run_validation

    src, truth = web_dir
    out = str(tmp_path / "out1")
    cfg = ValidateConfig()
    res = run_validation(f"{src}/webpages", out, cfg)
    v = res.verdicts.to_pandas().set_index("partition")
    # all langs present as partitions
    assert "en" in v.index
    total = v["rows"].sum()
    assert total == truth["n_rows"]
    # planted null-html rate 0.5% < 1% threshold → the big partitions
    # pass (tiny partitions can exceed it by sampling variance)
    assert v.loc["en", "c_null_rate"] == "pass"
    # violations sidecar exists per partition
    for p in v.index:
        pdir = os.path.join(out, "violations", f"lang={p}")
        assert os.path.isdir(pdir)
    # manifest committed every partition
    m = Manifest(os.path.join(out, "manifest"))
    assert m.committed_partitions() == set(v.index)

    # --- resume: second run skips everything
    res2 = run_validation(f"{src}/webpages", out, cfg)
    assert res2.partitions_run == []
    assert set(res2.partitions_skipped) == set(v.index)

    # --- partial resume: drop two partitions' commits → only they rerun
    for p in ["en", "de"]:
        os.unlink(os.path.join(out, "manifest", f"part-{p}.json"))
    res3 = run_validation(f"{src}/webpages", out, cfg)
    assert sorted(res3.partitions_run) == ["de", "en"]
    assert m.committed_partitions() == set(v.index)
    # rerun rows match the original for the resumed partitions
    v3 = res3.verdicts.to_pandas().set_index("partition")
    assert v3.loc["en", "rows"] == v.loc["en", "rows"]
    # verdicts after a partial resume cover the COMMITTED partitions too
    # (from the manifest outcomes) so all_passed() reflects the whole run
    assert set(v3.index) == set(v.index)
    for p in v.index:
        assert v3.loc[p, "rows"] == v.loc[p, "rows"]


def test_verdicts_detect_planted_anomalies(ray_session, web_dir, tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq

    from sod_ray.pipelines.validate import ValidateConfig, run_validation

    src, truth = web_dir
    out = str(tmp_path / "out2")
    # tighten thresholds so planted anomalies flip verdicts
    cfg = ValidateConfig(max_null_rate=0.0001, max_extract_mismatch_rate=0.0001)
    res = run_validation(f"{src}/webpages", out, cfg)
    v = res.verdicts.to_pandas()
    # with ~0.5% planted null html, the null check must now fail somewhere
    assert (v["c_null_rate"] == "fail").any()
    assert (v["c_extraction"] == "fail").any()
    # violation sidecar files (written by the distributed sinks) contain
    # both violation kinds
    import glob

    viols = []
    for p in v["partition"]:
        for f in glob.glob(os.path.join(out, "violations", f"lang={p}", "*.parquet")):
            viols.append(pq.read_table(f).to_pandas())
    allv = pd.concat(viols, join="outer", ignore_index=True)
    assert (allv["violation"] == "peak").sum() > 0
    assert (allv["violation"] == "extract_mismatch").sum() > 0


def test_schema_check_catches_missing(ray_session, web_dir):
    import ray.data as rd

    from sod_ray.pipelines.validate import WEBPAGE_SCHEMA
    from sod_ray.stages.constraints import schema_check

    src, _ = web_dir
    ds = rd.read_parquet(f"{src}/webpages")
    ok = schema_check(ds, WEBPAGE_SCHEMA)
    assert ok["passed"]
    bad = schema_check(ds.drop_columns(["lang"]), WEBPAGE_SCHEMA)
    assert not bad["passed"] and bad["missing"] == ["lang"]


def test_intermediate_parquet_path(ray_session, web_dir, tmp_path):
    """The 100TB path (featured table via parquet) must produce the
    same verdicts as the object-store materialize path."""
    from sod_ray.pipelines.validate import ValidateConfig, run_validation

    src, _ = web_dir
    a = run_validation(
        f"{src}/webpages", str(tmp_path / "outA"), ValidateConfig()
    ).verdicts.to_pandas()
    b = run_validation(
        f"{src}/webpages",
        str(tmp_path / "outB"),
        ValidateConfig(intermediate_dir=str(tmp_path / "inter")),
    ).verdicts.to_pandas()
    cols = ["partition", "rows", "violations", "passed"]
    import pandas as pd

    pd.testing.assert_frame_equal(
        a[cols].sort_values("partition").reset_index(drop=True),
        b[cols].sort_values("partition").reset_index(drop=True),
    )


def test_referential_run_level(ray_session, web_dir, tmp_path):
    """refs_path wires the FK-containment check into the flagship:
    planted dangling dst_urls are found, the check is resume-safe."""
    from sod_ray.pipelines.validate import ValidateConfig, run_validation

    src, truth = web_dir
    out = str(tmp_path / "outR")
    cfg = ValidateConfig(refs_path=f"{src}/webpage_refs")
    res = run_validation(f"{src}/webpages", out, cfg)
    assert res.referential is not None
    assert res.referential["n_dangling"] == len(truth["refs"]["dangling"])
    assert res.referential["referential"] == "fail"  # 1% > 0.1% threshold
    # violations on disk match the planted set
    import pyarrow.parquet as pq
    import glob

    files = glob.glob(os.path.join(out, "violations", "referential", "*.parquet"))
    got = sorted(
        set(
            pq.read_table(f).column("dst_url").to_pylist()[i]
            for f in files
            for i in range(pq.read_table(f).num_rows)
        )
    )
    assert got == truth["refs"]["dangling"]
    # resume: second run reuses the committed record
    res2 = run_validation(f"{src}/webpages", out, cfg)
    assert res2.referential["n_dangling"] == res.referential["n_dangling"]


def test_drift_across_runs(ray_session, web_dir, tmp_path):
    """Run N writes baseline.parquet; run N+1 with baseline_path gets a
    drift outcome — same data passes, shifted data fails."""
    import pyarrow.parquet as pq

    from sod_ray.pipelines.validate import ValidateConfig, run_validation
    from sod_ray.sources.webpages import synth_shard, write_webpages

    src, _ = web_dir
    out1 = str(tmp_path / "r1")
    res1 = run_validation(f"{src}/webpages", out1, ValidateConfig())
    assert os.path.exists(os.path.join(out1, "baseline.parquet"))

    # same data vs the baseline → drift passes everywhere
    out2 = str(tmp_path / "r2")
    cfg2 = ValidateConfig(baseline_path=os.path.join(out1, "baseline.parquet"))
    res2 = run_validation(f"{src}/webpages", out2, cfg2)
    v2 = res2.verdicts.to_pandas()
    assert "c_drift" in v2.columns
    assert (v2["c_drift"] == "pass").all()

    # shifted data (10x longer docs) vs the baseline → drift fails
    shifted_dir = str(tmp_path / "shifted")
    os.makedirs(f"{shifted_dir}/webpages", exist_ok=True)
    t, _ = synth_shard(2000, shard=0, seed=42, mean_tokens=400)
    pq.write_table(t, f"{shifted_dir}/webpages/shard=00000.parquet")
    out3 = str(tmp_path / "r3")
    res3 = run_validation(f"{shifted_dir}/webpages", out3, cfg2)
    v3 = res3.verdicts.to_pandas()
    assert (v3["c_drift"] == "fail").any()


def test_baseline_survives_partial_resume(ray_session, web_dir, tmp_path):
    """A resumed run recomputes only some partitions; baseline.parquet
    must keep the other partitions' sketches (merge, not clobber)."""
    import pyarrow.parquet as pq

    from sod_ray.pipelines.validate import ValidateConfig, run_validation

    src, _ = web_dir
    out = str(tmp_path / "outB")
    run_validation(f"{src}/webpages", out, ValidateConfig())
    bpath = os.path.join(out, "baseline.parquet")
    full_keys = set(
        map(tuple, pq.read_table(bpath).to_pandas()[["part_key", "column"]].values)
    )
    # force a partial resume of just one partition
    os.unlink(os.path.join(out, "manifest", "part-en.json"))
    run_validation(f"{src}/webpages", out, ValidateConfig())
    after_keys = set(
        map(tuple, pq.read_table(bpath).to_pandas()[["part_key", "column"]].values)
    )
    assert after_keys == full_keys


def test_host_derived_part_key(ray_session, web_dir, tmp_path):
    """host(url) partitioning profile: derived key, many skewed
    partitions, resume without pushdown."""
    import pyarrow as pa

    from sod_ray.pipelines.validate import (
        ValidateConfig,
        host_of,
        run_validation,
    )

    assert host_of(
        pa.array(
            ["https://a.example.com/x/y", "http://b.co/", None, "garbage"]
        )
    ).to_pylist() == ["a.example.com", "b.co", None, None]

    src, truth = web_dir
    out = str(tmp_path / "outh")
    cfg = ValidateConfig(part_key="host", part_key_expr="host")
    res = run_validation(f"{src}/webpages", out, cfg)
    v = res.verdicts.to_pandas().set_index("partition")
    assert v["rows"].sum() == truth["n_rows"]
    assert all(p.endswith(".example.com") for p in v.index)
    assert len(v) > 100  # zipf host key space is wide
    # hot host (zipf mass at host1) dominates
    assert v.loc["host1.example.com", "rows"] > v["rows"].median() * 10

    # resume: drop one host's commit -> only it reruns, same rows
    victim = "host1.example.com"
    os.unlink(os.path.join(out, "manifest", f"part-{victim}.json"))
    res2 = run_validation(f"{src}/webpages", out, cfg)
    assert res2.partitions_run == [victim]
    v2 = res2.verdicts.to_pandas().set_index("partition")
    assert v2.loc[victim, "rows"] == v.loc[victim, "rows"]
    assert set(v2.index) == set(v.index)


def test_verdict_files_consistent_across_kill_windows(ray_session, web_dir, tmp_path):
    """Both kill windows around the wave commit leave the on-disk
    verdict files exactly covering the committed partitions once:

    - verdicts written, commit missed (old window A): the resume scrub
      drops the uncommitted partitions' rows before they re-run, so
      _load_verdicts never double-counts;
    - commit written, verdicts missed (old window B): impossible now —
      the wave writes verdicts+baseline BEFORE its first commit — but
      simulate the legacy state and confirm the in-memory result still
      rebuilds those rows from the manifest."""
    import pyarrow.parquet as pq

    from sod_ray.pipelines.validate import (
        ValidateConfig,
        _load_verdicts,
        run_validation,
    )

    src, truth = web_dir
    out = str(tmp_path / "killwin")
    res = run_validation(f"{src}/webpages", out, ValidateConfig())
    clean = _load_verdicts(out).to_pandas().set_index("partition").sort_index()
    n_rows_total = clean["rows"].sum()

    # window A: a partition's verdict rows exist on disk but its
    # manifest record is gone (kill between verdict write and commit)
    os.unlink(os.path.join(out, "manifest", "part-en.json"))
    res_a = run_validation(f"{src}/webpages", out, ValidateConfig())
    assert res_a.partitions_run == ["en"]
    after_a = _load_verdicts(out).to_pandas()
    # exactly one row per partition — the stale 'en' row was scrubbed
    assert after_a["partition"].value_counts().max() == 1
    after_a = after_a.set_index("partition").sort_index()
    assert after_a["rows"].sum() == n_rows_total
    assert (after_a["rows"] == clean["rows"]).all()

    # window B (legacy): manifest committed but verdict file lost
    for f in os.listdir(out):
        if f.startswith("verdicts-"):
            t = pq.read_table(os.path.join(out, f))
            import pyarrow.compute as pc

            keep = t.filter(pc.invert(pc.equal(t["partition"], "de")))
            if keep.num_rows:
                pq.write_table(keep, os.path.join(out, f))
            else:
                os.remove(os.path.join(out, f))
    res_b = run_validation(f"{src}/webpages", out, ValidateConfig())
    assert res_b.partitions_run == []  # fully committed → nothing reruns
    vb = res_b.verdicts.to_pandas().set_index("partition")
    assert "de" in vb.index  # rebuilt from the manifest record
    assert vb.loc["de", "rows"] == clean.loc["de", "rows"]


def test_quality_check_constraint(ray_session, web_dir, tmp_path):
    """Opt-in Gopher-quality constraint: the fused pass computes the
    per-doc pass flag, the sketch merge carries only per-partition
    fail COUNTS, and the verdict gains a `quality` outcome whose
    counts match a direct per-lang computation."""
    import pyarrow.parquet as pq

    from sod_ray.pipelines.validate import ValidateConfig, run_validation
    from sod_ray.stages.textstage import gopher_stats_batch

    src, truth = web_dir
    out = str(tmp_path / "outq")
    cfg = ValidateConfig(quality_check=True, max_low_quality_rate=0.5)
    res = run_validation(f"{src}/webpages", out, cfg)
    v = res.verdicts.to_pandas().set_index("partition")
    assert "c_quality" in v.columns

    # direct reference: gopher pass flag per doc, grouped by lang
    import glob

    import pandas as pd

    frames = []
    for f in glob.glob(f"{src}/webpages/*.parquet"):
        t = pq.read_table(f, columns=["lang", "text"])
        q = gopher_stats_batch(
            t.append_column(
                "doc_id", pa.array(np.arange(len(t)), pa.int64())
            )
        )
        frames.append(
            pd.DataFrame(
                {
                    "lang": t["lang"].to_pandas(),
                    "fail": ~q["quality_pass"].to_pandas(),
                }
            )
        )
    ref = pd.concat(frames).groupby("lang")["fail"].agg(["sum", "count"])
    for lang, row in ref.iterrows():
        expect = "pass" if row["sum"] <= 0.5 * row["count"] else "fail"
        assert v.loc[lang, "c_quality"] == expect, lang

    # default config never computes the flag (no hot-path cost)
    out2 = str(tmp_path / "outq2")
    res2 = run_validation(f"{src}/webpages", out2, ValidateConfig())
    assert "c_quality" not in res2.verdicts.to_pandas().columns


def test_normalize_urls_uniqueness(ray_session, tmp_path):
    """normalize_urls=True: mirror-crawl url variants (case/trailing
    slash/utm/fragment of the same page) count as duplicates; raw-url
    uniqueness (default) sees them as distinct and passes."""
    import pyarrow.parquet as pq

    from sod_ray.pipelines.validate import ValidateConfig, run_validation
    from sod_ray.sources.webpages import write_webpages

    src = str(tmp_path / "webn")
    write_webpages(src, n_rows=400, n_shards=1, seed=9)
    t = pq.read_table(f"{src}/webpages/shard=00000.parquet")
    urls = t["url"].to_pylist()
    # 20 mirror variants of the FIRST url: differ raw, same canonical
    base = urls[0].rstrip("/")
    for i in range(1, 21):
        scheme_cased = (
            base.replace("https://", "HTTPS://") if i % 2 else base
        )
        urls[i] = scheme_cased + f"?utm_source=m{i}" + ("#f" if i % 3 else "")
    t = t.set_column(
        t.schema.get_field_index("url"), "url", pa.array(urls, pa.string())
    )
    src2 = str(tmp_path / "webn2")
    os.makedirs(src2)
    pq.write_table(t, f"{src2}/shard=00000.parquet")

    raw_cfg = ValidateConfig()
    res_raw = run_validation(src2, str(tmp_path / "o_raw"), raw_cfg)
    v_raw = res_raw.verdicts.to_pandas().set_index("partition")

    norm_cfg = ValidateConfig(normalize_urls=True)
    res_norm = run_validation(src2, str(tmp_path / "o_norm"), norm_cfg)
    v_norm = res_norm.verdicts.to_pandas().set_index("partition")

    lang = t["lang"][0].as_py()  # the planted variants share row 0's lang
    assert v_raw.loc[lang, "c_uniqueness"] == "pass"
    assert v_norm.loc[lang, "c_uniqueness"] == "fail"


def test_docs_token_budget_sample(ray_session, tmp_path):
    """Crafted corpus exercising every budget-cut path: a lang that
    fits entirely (no boundary), a lang cut INSIDE a quality level by
    doc_id order, and zero-token docs (kept for free when their level
    is reached). Checked against a brute-force pandas reference of the
    SQL rule: keep while cumulative tokens <= 50000 over
    (floor(quality*1e6) DESC, doc_id)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sod_ray.pipelines.queries import DOCS_BUDGET_SQL, docs_token_budget_sample

    rng = np.random.default_rng(31)
    rows = []
    did = 0
    # "aa": tiny — fits whole budget
    for _ in range(10):
        rows.append((did, "aa", "the and of to a in is that it for " * 5))
        did += 1
    # "bb": one big high-quality level that must split by doc_id,
    # plus junk-quality docs below it and an empty doc
    for i in range(400):
        n = int(rng.integers(150, 260))
        rows.append((did, "bb", "the and of to a in is that it was " * (n // 10)))
        did += 1
    for _ in range(30):
        rows.append((did, "bb", "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"))
        did += 1
    rows.append((did, "bb", ""))
    did += 1
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array(["t"] * len(rows), pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[2]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    out = docs_token_budget_sample(str(tmp_path)).to_pandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    ref = (
        con.sql(DOCS_BUDGET_SQL)
        .df()
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )
    assert len(out) == len(ref)
    assert out["doc_id"].tolist() == ref["doc_id"].tolist()
    assert out["n_tokens"].astype("int64").tolist() == ref["n_tokens"].astype("int64").tolist()
    # the interesting paths actually fired: aa fully kept, bb split
    assert (out["lang"] == "aa").sum() == 10
    n_bb = (out["lang"] == "bb").sum()
    assert 0 < n_bb < 431


def test_full_run_kll_backend(ray_session, web_dir, tmp_path):
    """The flagship with quantile_sketch='kll' produces the SAME
    verdict table as the t-digest default (verdicts depend on counts
    and peak flags, not the quantile backend) and the committed stats
    carry KLL bytes."""
    from sod_ray.pipelines.validate import ValidateConfig, run_validation

    src, _ = web_dir
    res_td = run_validation(
        f"{src}/webpages", str(tmp_path / "td"), ValidateConfig()
    )
    res_kll = run_validation(
        f"{src}/webpages",
        str(tmp_path / "kll"),
        ValidateConfig(quantile_sketch="kll"),
    )
    vt = res_td.verdicts.to_pandas().set_index("partition").sort_index()
    vk = res_kll.verdicts.to_pandas().set_index("partition").sort_index()
    assert list(vt.index) == list(vk.index)
    for c in vt.columns:
        assert vt[c].tolist() == vk[c].tolist(), c
    # stats rows decode as KLL and the p50s agree within rank tolerance
    import pyarrow.parquet as pq

    from sod_ray.state.sketches import KLL, quantile_sketch_from_bytes

    sp = os.path.join(str(tmp_path / "kll"), "baseline.parquet")
    assert os.path.exists(sp)
    st = pq.read_table(sp).to_pandas()
    assert len(st)
    assert isinstance(quantile_sketch_from_bytes(st["tdigest"].iloc[0]), KLL)
