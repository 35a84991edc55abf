"""ANN similarity search over the driver's embeddings table."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def embeddings(ray_session, sf_smoke):
    import ray.data as rd

    return rd.read_parquet(f"{sf_smoke}/embeddings.parquet")


def _exact_oracle(sf_dir, queries, k):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    V = np.stack([np.asarray(v, dtype=np.float32) for v in t["embedding"].to_pylist()])
    ids = t["vec_id"].to_numpy()
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    Qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    S = Qn @ Vn.T
    out = {}
    for qi in range(S.shape[0]):
        order = sorted(zip(-S[qi], ids))[:k]
        out[qi] = [int(i) for _, i in order]
    return out


def test_brute_force_topk(ray_session, embeddings, sf_smoke):
    import pyarrow.parquet as pq

    from sod_ray.stages.similarity import brute_force_topk

    t = pq.read_table(f"{sf_smoke}/embeddings.parquet")
    Q = np.stack(
        [np.asarray(v, dtype=np.float32) for v in t["embedding"].to_pylist()[:3]]
    )
    got = brute_force_topk(embeddings, Q, "embedding", "vec_id", k=5)
    oracle = _exact_oracle(sf_smoke, Q, 5)
    for qi in range(3):
        mine = got[got["query_id"] == qi].sort_values("rank")["cand_id"].tolist()
        assert mine == oracle[qi]
    # self is always rank 1 with cosine ~1
    r1 = got[got["rank"] == 1]
    assert np.allclose(r1["cosine"], 1.0, atol=1e-5)


def test_ivf_topk_recall(ray_session, embeddings, sf_smoke):
    import pyarrow.parquet as pq

    from sod_ray.stages.similarity import ivf_topk

    t = pq.read_table(f"{sf_smoke}/embeddings.parquet")
    Q = np.stack(
        [np.asarray(v, dtype=np.float32) for v in t["embedding"].to_pylist()[:5]]
    )
    got = ivf_topk(embeddings, Q, "embedding", "vec_id", k=5, nprobe=16)
    oracle = _exact_oracle(sf_smoke, Q, 5)
    recalls = []
    for qi in range(5):
        mine = set(got[got["query_id"] == qi]["cand_id"])
        recalls.append(len(mine & set(oracle[qi])) / 5)
    assert np.mean(recalls) >= 0.6  # approximate path, decent recall
