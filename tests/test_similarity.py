"""ANN similarity search over the driver's embeddings table."""

import numpy as np
import pyarrow as pa
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


def test_to_matrix_zero_copy_paths():
    """list / fixed_size_list / sliced arrays all reshape the flat
    values buffer identically to the per-row fallback."""
    from sod_ray.stages.similarity import _to_matrix

    rows = [[float(i), float(i + 1), float(i + 2)] for i in range(6)]
    want = np.asarray(rows, np.float32)
    lst = pa.array(rows, pa.list_(pa.float32()))
    fsl = lst.cast(pa.list_(pa.float32(), 3))
    np.testing.assert_allclose(_to_matrix(lst), want)
    np.testing.assert_allclose(_to_matrix(fsl), want)
    np.testing.assert_allclose(_to_matrix(lst.slice(2, 3)), want[2:5])
    np.testing.assert_allclose(_to_matrix(fsl.slice(2, 3)), want[2:5])
    chunked = pa.chunked_array([lst.slice(0, 3), lst.slice(3, 3)])
    np.testing.assert_allclose(_to_matrix(chunked), want)
    # ragged input still works via the fallback
    ragged = pa.array([[1.0], [2.0, 3.0]], pa.list_(pa.float32()))
    assert _to_matrix(ragged.slice(0, 1)).shape == (1, 1)


def test_ivf_recall_on_clustered_corpus(ray_session):
    """On a corpus with real cluster structure the trained quantizer
    must recover it: recall@10 ≈ 1 even probing 1/16 of the cells."""
    import ray.data as rd

    from sod_ray.stages.similarity import (
        brute_force_topk,
        ivf_topk,
        train_centroids,
    )

    rng = np.random.default_rng(3)
    dim, n_clusters, n = 32, 64, 20_000
    centers = rng.normal(size=(n_clusters, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    lab = rng.integers(0, n_clusters, n)
    X = centers[lab] + (0.65 / np.sqrt(dim)) * rng.normal(
        size=(n, dim)
    ).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(X), pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t).repartition(8).materialize()
    Q = X[rng.choice(n, 8, replace=False)]
    C = train_centroids(ds, "embedding", n_centroids=n_clusters)
    brute = brute_force_topk(ds, Q, "embedding", "vec_id", k=10)
    ivf = ivf_topk(ds, Q, "embedding", "vec_id", k=10, centroids=C, nprobe=4)
    recalls = []
    for qi in range(8):
        want = set(brute[brute["query_id"] == qi]["cand_id"])
        got = set(ivf[ivf["query_id"] == qi]["cand_id"])
        recalls.append(len(got & want) / 10)
    assert np.mean(recalls) >= 0.9
