"""TextFeatures Arrow/pandas parity."""

import pytest


def test_textfeatures_arrow_pandas_parity(ray_session):
    """The Arrow single-pass path must produce exactly the pandas
    path's features (same compiled regexes, same per-doc functions)."""
    import pandas as pd
    import pyarrow as pa

    from sod_ray.stages.textstage import TextFeatures

    texts = [
        "The quick brown fox! Jumps; over 42 lazy dogs?",
        "",
        None,
        "word " * 50,
        "ALL CAPS AND PUNCT!!! ###",
        "mixed 语言 tokens, and the of a an in to is",
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": pa.array(texts, pa.string())})
    tf = TextFeatures()
    a = tf(t).to_pandas()
    p = tf(t.to_pandas())
    for col in ["n_chars", "n_tokens", "punct_ratio", "stopword_ratio", "quality"]:
        assert a[col].tolist() == pytest.approx(p[col].tolist()), col
