"""arrow_block_refs: to_arrow_refs' contract without its plan re-execution
(stages/blocks.py — the Sort->limit=1 double-shuffle fix)."""

import pyarrow as pa
import ray


def test_arrow_blocks_zero_copy(ray_session):
    import ray.data as rd

    from sod_ray.stages.blocks import arrow_block_refs

    ds = (
        rd.range(10000)
        .map_batches(lambda t: t, batch_format="pyarrow")
        .sort("id")
    )
    refs = arrow_block_refs(ds)
    blocks = ray.get(refs)
    assert all(isinstance(b, pa.Table) for b in blocks)
    assert sum(b.num_rows for b in blocks) == 10000
    ids = [i for b in blocks for i in b["id"].to_pylist()]
    assert ids == sorted(ids)


def test_pandas_blocks_converted(ray_session):
    import ray.data as rd

    from sod_ray.stages.blocks import arrow_block_refs

    ds = rd.range(1000).map_batches(lambda df: df, batch_format="pandas")
    blocks = ray.get(arrow_block_refs(ds))
    assert all(isinstance(b, pa.Table) for b in blocks)
    assert sum(b.num_rows for b in blocks) == 1000
