"""Arrival-driven landing-zone source (S3) and webhook push sink (S6)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_shard(d, name, ids):
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "lang": pa.array(["en"] * len(ids))}),
        os.path.join(d, name),
    )


def test_landing_zone_poll_commit(ray_session, tmp_path):
    from sod_ray.sources.landing import LandingZone

    d = str(tmp_path / "landing")
    os.makedirs(d)
    _write_shard(d, "shard-0.parquet", [1, 2])
    _write_shard(d, "shard-1.parquet", [3])
    lz = LandingZone(d)

    ds, files = lz.poll()
    assert sorted(files) == ["shard-0.parquet", "shard-1.parquet"]
    assert ds.count() == 3
    lz.commit(files)
    # nothing new → empty poll
    ds2, files2 = lz.poll()
    assert ds2 is None and files2 == []
    # a new arrival is picked up alone
    _write_shard(d, "shard-2.parquet", [4, 5])
    ds3, files3 = lz.poll()
    assert files3 == ["shard-2.parquet"] and ds3.count() == 2


def test_landing_zone_loop_and_crash_redelivery(ray_session, tmp_path):
    """A failing callback leaves shards uncommitted; the next poll
    redelivers them (at-least-once, reference alert semantics)."""
    import pytest

    from sod_ray.sources.landing import LandingZone

    d = str(tmp_path / "landing2")
    os.makedirs(d)
    _write_shard(d, "a.parquet", [1])
    lz = LandingZone(d)

    calls = {"n": 0}

    def flaky(ds, files):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("consumer died mid-batch")

    with pytest.raises(RuntimeError):
        lz.run_loop(flaky, interval_s=0.0, max_polls=1)
    assert lz.committed() == set()  # crash → uncommitted
    n = lz.run_loop(flaky, interval_s=0.0, max_polls=1)
    assert n == 1 and lz.committed() == {"a.parquet"}


def test_webhook_push_retry_and_records(ray_session):
    """Per-entity POST payloads with bounded retry; failed deliveries
    surface as ok=False records (the redelivery worklist)."""
    import ray.data as rd

    from sod_ray.stages.alertsink import webhook_push

    df = pd.DataFrame(
        {
            "lang": ["en", "en", "de", "xx"],
            "url": ["u1", "u2", "u3", "u4"],
            "violation": ["peak"] * 4,
        }
    )

    def transport(url, payload):
        import json

        body = json.loads(payload)
        if body["entityId"] == "de":
            return 503  # always failing target
        assert "data" in body and all("url" in r for r in body["data"])
        return 200

    recs = webhook_push(
        rd.from_pandas(df),
        targets={"en": "http://hook/en", "de": "http://hook/de"},
        entity_col="lang",
        transport=transport,
        max_retries=2,
        backoff_s=0.0,
    ).to_pandas().set_index("entity")
    assert bool(recs.loc["en", "ok"]) and recs.loc["en", "rows"] == 2
    assert not bool(recs.loc["de", "ok"]) and recs.loc["de", "attempts"] == 2
    assert not bool(recs.loc["xx", "ok"])  # no target configured
    assert recs.loc["xx", "error"] == "no target for entity"


def test_incremental_landing_validate_loop(ray_session, tmp_path):
    """Landing zone → flagship loop: each arrival batch validates into
    its own (retry-stable) run dir; sketches roll into a cross-run
    drift baseline; an empty zone processes nothing."""
    import os

    import pyarrow.parquet as pq

    from sod_ray.pipelines.incremental import run_incremental
    from sod_ray.pipelines.validate import _load_verdicts
    from sod_ray.sources.webpages import synth_shard

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    t0, _ = synth_shard(1500, shard=0, seed=5)
    pq.write_table(t0, os.path.join(landing, "shard-0.parquet"))
    out = str(tmp_path / "incr")

    r1 = run_incremental(landing, out, max_empty_polls=1)
    assert r1["shards_processed"] == 1 and len(r1["runs"]) == 1
    assert r1["baseline_path"] and os.path.exists(r1["baseline_path"])
    v1 = _load_verdicts(r1["runs"][0]["out_dir"]).to_pandas()
    assert v1["rows"].sum() == 1500
    assert "c_drift" not in v1.columns  # no baseline on the first run

    # second arrival → second run, drift-scored against run 1. The
    # content is byte-identical to shard 0 (new file name), so the
    # drift verdict must be a deterministic pass — identical digests,
    # KS/PSI exactly 0 (distinct-distribution flagging is pinned by
    # tests/test_pipeline.py::test_drift_across_runs; near-identical
    # NON-equal samples sit inside t-digest noise at the threshold and
    # would make this assertion flaky)
    pq.write_table(t0, os.path.join(landing, "shard-1.parquet"))
    r2 = run_incremental(landing, out, max_empty_polls=1)
    assert r2["shards_processed"] == 1 and len(r2["runs"]) == 1
    assert r2["runs"][0]["out_dir"] != r1["runs"][0]["out_dir"]
    v2 = _load_verdicts(r2["runs"][0]["out_dir"]).to_pandas()
    assert v2["rows"].sum() == 1500
    assert "c_drift" in v2.columns  # baseline from run 1 applied
    assert (v2["c_drift"] == "pass").all()

    # nothing new → nothing processed
    r3 = run_incremental(landing, out, max_empty_polls=1)
    assert r3["shards_processed"] == 0 and r3["runs"] == []


def test_collect_json_ingest(ray_session, tmp_path):
    """Reference collect-payload JSON-lines ingest: flatten, per-request
    createdAt sort, deterministic metric projection, malformed rows as
    violations not crashes."""
    import json
    import os

    from sod_ray.sources.collect_json import read_collect_json

    lines = [
        json.dumps(
            {
                "entity": "e1",
                "data": [
                    {"vector": [3.0, 4.0], "createdAt": "2026-01-01T00:00:02Z",
                     "extra": {"k": 2}},
                    {"vector": [1.0, 2.0], "createdAt": "2026-01-01T00:00:01Z",
                     "extra": {"k": 1}},
                ],
            }
        ),
        json.dumps(
            {
                "entity": "e2",
                "data": [
                    {"vector": [9.0], "createdAt": "2026-01-01T00:00:05Z"},
                    {"vector": "not-a-vector", "createdAt": "2026-01-01T00:00:06Z"},
                ],
            }
        ),
        "{ this is not json",
    ]
    p = str(tmp_path / "collect.jsonl")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")

    import ray

    def collect(ds):
        # Dataset.to_pandas coerces list columns through the tensor
        # extension, which rejects RAGGED vectors — go via Arrow
        tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        return pa.concat_tables(tbls, promote_options="default").to_pandas()

    out = collect(read_collect_json(p))
    assert len(out) == 5
    ok = out[out["parse_error"] == ""]
    bad = out[out["parse_error"] != ""]
    assert len(ok) == 3 and len(bad) == 2
    # per-request sort by createdAt: e1's earlier point first
    e1 = ok[ok["entity_id"] == "e1"].reset_index(drop=True)
    assert list(e1["vector"].iloc[0]) == [1.0, 2.0]
    assert e1["created_at"].is_monotonic_increasing
    assert e1["extra"].iloc[0] == '{"k": 1}'
    # metric projection: status=New, deterministic row ids
    assert set(ok["status"]) == {1}
    assert ok["row_id"].notna().all() and ok["row_id"].nunique() == 3
    # malformed item keeps its entity; malformed line keeps the raw text
    assert (bad["raw"].notna()).all()
    assert "e2" in set(bad["entity_id"].dropna())
    # determinism: a second read yields identical row ids
    out2 = collect(read_collect_json(p))
    a = out[out["parse_error"] == ""].sort_values("row_id")["row_id"].tolist()
    b = out2[out2["parse_error"] == ""].sort_values("row_id")["row_id"].tolist()
    assert a == b


def test_landing_zone_quarantines_poison_shards(ray_session, tmp_path):
    """A torn file or schema-drifted shard must not wedge the loop:
    it is quarantined (with reason) once past the grace window, and
    healthy shards keep flowing."""
    from sod_ray.sources.landing import LandingZone

    d = str(tmp_path / "landing3")
    os.makedirs(d)
    _write_shard(d, "good-0.parquet", [1, 2])
    # torn file: not a parquet footer
    with open(os.path.join(d, "torn.parquet"), "wb") as f:
        f.write(b"PAR1\x00\x00garbage")
    # schema drift: missing the doc_id column the consumer expects
    pq.write_table(
        pa.table({"lang": pa.array(["en"])}),
        os.path.join(d, "drifted.parquet"),
    )
    old = os.path.join(d, "torn.parquet")
    past = os.path.getmtime(old) - 60
    os.utime(old, (past, past))
    os.utime(os.path.join(d, "drifted.parquet"), (past, past))

    lz = LandingZone(d, expected_columns=["doc_id", "lang"],
                     quarantine_grace_s=5.0)
    ds, files = lz.poll()
    assert files == ["good-0.parquet"] and ds.count() == 2
    lz.commit(files)
    q = lz.quarantined()
    assert set(q) == {"torn.parquet", "drifted.parquet"}
    assert "unreadable" in q["torn.parquet"]
    assert "doc_id" in q["drifted.parquet"]
    # quarantined files never come back
    ds2, files2 = lz.poll()
    assert ds2 is None and files2 == []


def test_landing_zone_grace_window(ray_session, tmp_path):
    """A fresh unreadable file (producer mid-write) is skipped but NOT
    quarantined inside the grace window; it is delivered once complete."""
    from sod_ray.sources.landing import LandingZone

    d = str(tmp_path / "landing4")
    os.makedirs(d)
    partial = os.path.join(d, "inflight.parquet")
    with open(partial, "wb") as f:
        f.write(b"PAR1")  # producer still writing
    lz = LandingZone(d, quarantine_grace_s=60.0)
    ds, files = lz.poll()
    assert ds is None and files == [] and lz.quarantined() == {}
    # producer finishes the write; next poll delivers it
    pq.write_table(pa.table({"doc_id": pa.array([7], pa.int64())}), partial)
    ds2, files2 = lz.poll()
    assert files2 == ["inflight.parquet"] and ds2.count() == 1


def test_scrape_transport_parity(tmp_path):
    """S3 transport tail: injectable fetch delivering the reference wire
    format end-to-end — gunzip sniff, response-entity wins, per-response
    createdAt sort, NewMetric projection, parse errors as violation
    rows, transport failures as error records (scrape.go:132-213)."""
    import gzip
    import json

    from sod_ray.sources.scrape import gunzip_if_needed, scrape_targets

    ok_payload = json.dumps(
        {
            "entity": "srv-a",
            "data": [
                {"vector": [3.0], "createdAt": "2026-01-01T00:00:09Z"},
                {"vector": [1.0], "createdAt": "2026-01-01T00:00:01Z",
                 "extra": {"n": 1}},
            ],
        }
    ).encode()
    store = {
        "http://a/metrics": gzip.compress(ok_payload),  # gzip-encoded
        "http://b/metrics": b'{"entity": "srv-b", "data": [{"vector": [5.0], "createdAt": "2026-01-01T00:00:03Z"}]}',
        "http://c/metrics": b"{ not json at all",
    }

    def fetch(url: str) -> bytes:
        if url == "http://down/metrics":
            raise ConnectionError("refused")
        return store[url]

    targets = [
        {"url": "http://a/metrics", "entityId": "ignored-a"},
        {"url": "http://b/metrics", "entityId": "ignored-b"},
        {"url": "http://c/metrics", "entityId": "ignored-c"},
        {"url": "http://down/metrics", "entityId": "d"},
    ]
    rows, errors = scrape_targets(targets, fetch)
    assert [e["url"] for e in errors] == ["http://down/metrics"]
    df = rows.to_pandas()
    good = df[df["parse_error"] == ""]
    bad = df[df["parse_error"] != ""]
    # response entity names the stream; per-response sort by createdAt
    a = good[good["entity_id"] == "srv-a"].reset_index(drop=True)
    assert list(a["vector"].map(lambda v: v[0])) == [1.0, 3.0]
    assert set(good["entity_id"]) == {"srv-a", "srv-b"}
    assert len(bad) == 1  # the malformed body became a violation row
    # deterministic metric projection on every valid row
    assert good["row_id"].notna().all()
    assert good["status"].notna().all()
    assert gunzip_if_needed(b"plain") == b"plain"


def test_scrape_to_landing(tmp_path):
    """A pull wave lands as one decodable JSON-lines shard; undecodable
    responses are skipped with a typed error (reference logs+skips)."""
    import json

    from sod_ray.sources.scrape import scrape_to_landing

    ok = json.dumps(
        {"entity": "e", "data": [{"vector": [1.0],
                                  "createdAt": "2026-01-01T00:00:01Z"}]}
    ).encode()
    fetch = lambda url: ok if "good" in url else b"broken{{"
    path, errors = scrape_to_landing(
        [{"url": "http://good/1"}, {"url": "http://bad/2"}],
        fetch,
        str(tmp_path / "landing"),
        "wave-000.jsonl",
    )
    assert path and path.endswith("wave-000.jsonl")
    assert [e["url"] for e in errors] == ["http://bad/2"]
    with open(path) as f:
        lines = [ln for ln in f.read().splitlines() if ln]
    assert len(lines) == 1 and json.loads(lines[0])["entity"] == "e"


def test_incremental_categorical_drift(ray_session, tmp_path):
    """categorical_columns rolls a lang-mix baseline across arrival
    batches: an identical mix stays quiet; a skewed third wave flags."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from sod_ray.pipelines.incremental import run_incremental
    from sod_ray.sources.webpages import synth_shard

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    t0, _ = synth_shard(1500, shard=0, seed=5)
    pq.write_table(t0, os.path.join(landing, "s0.parquet"))
    out = str(tmp_path / "incr")

    r1 = run_incremental(
        landing, out, max_empty_polls=1, categorical_columns=("lang",)
    )
    assert r1["runs"][0]["categorical_drift"] is None or not r1["runs"][0][
        "categorical_drift"
    ].get("lang")  # first run: no baseline → no flag
    assert os.path.exists(os.path.join(out, "categorical_baseline.parquet"))

    # same mix (fresh shard, same generator) → quiet
    t1, _ = synth_shard(1500, shard=1, seed=5)
    pq.write_table(t1, os.path.join(landing, "s1.parquet"))
    r2 = run_incremental(
        landing, out, max_empty_polls=1, categorical_columns=("lang",)
    )
    assert r2["runs"][0]["categorical_drift"] == {"lang": False}

    # a wave that's ~100% one lang → mix shift flags
    t2, _ = synth_shard(1500, shard=2, seed=6)
    lang = pa.array(["zz"] * t2.num_rows, pa.string())
    t2 = t2.set_column(t2.schema.get_field_index("lang"), "lang", lang)
    pq.write_table(t2, os.path.join(landing, "s2.parquet"))
    r3 = run_incremental(
        landing, out, max_empty_polls=1, categorical_columns=("lang",)
    )
    assert r3["runs"][0]["categorical_drift"] == {"lang": True}
