"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship per-partition validation pass over the
sf0.001 tables; ``queries()`` exposes every implemented operator from
SURVEY.md §2 (and the training-data-pipeline extensions); each SQL-
expressible query has a DuckDB oracle in ``oracle_sql()`` with
IDENTICAL column names and rounding.

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() anywhere in the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline: per-lang validation verdicts over the sf0.001
    documents table — sketch stats + uniqueness + null checks + quality,
    the documents-table analog of sod_ray.pipelines.validate."""
    import pandas as pd
    import pyarrow as pa

    from sod_ray.pipelines.queries import sketch_stats_documents
    from sod_ray.stages.constraints import null_rates, uniqueness_estimate
    from sod_ray.stages.textstage import TextFeatures

    import ray.data as rd

    docs = rd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    stats = sketch_stats_documents(SF_SMOKE).to_pandas()
    uniq = uniqueness_estimate(docs, "doc_id", key="lang").to_pandas()
    nulls = null_rates(docs, ["text", "lang"], key="lang").to_pandas()
    # low-quality rate per lang: lang rides through the feature stage
    # and a tiny groupby-sum collects ONLY per-lang counters — no
    # full-table driver merge (scale-killer shape at 10^12 rows)
    from ray.data.aggregate import Count, Sum

    # concurrency sized to the input so a single-block sf0.001 smoke
    # doesn't spin up idle actors; Arrow batch format end-to-end
    pool = max(1, min(2, len(docs.input_files())))
    low_q = (
        docs.select_columns(["doc_id", "lang", "text"])
        .map_batches(TextFeatures, batch_format="pyarrow", concurrency=pool)
        .map_batches(
            lambda t: pa.table(
                {
                    "lang": t["lang"],
                    "low_q": pa.array(
                        (t["quality"].to_numpy(zero_copy_only=False) < 0.5).astype(
                            "int64"
                        )
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("lang")
        .aggregate(Sum("low_q", alias_name="n_low"), Count(alias_name="n"))
        .to_pandas()
    )
    low_q_by_lang = (low_q.set_index("lang")["n_low"] / low_q.set_index("lang")["n"]).to_dict()

    verdicts = []
    for lang in sorted(stats["part_key"].unique()):
        s = stats[stats["part_key"] == lang].iloc[0]
        u = uniq[uniq["part_key"] == lang].iloc[0]
        n = nulls[(nulls["part_key"] == lang) & (nulls["column"] == "text")].iloc[0]
        verdicts.append(
            {
                "partition": lang,
                "rows": int(u["rows"]),
                "mean_n_chars": float(s["mean"]),
                "p50_n_chars": float(s["p50"]),
                "distinct_doc_est": float(u["distinct_est"]),
                "null_rate_text": float(n["null_rate"]),
                "low_quality_rate": float(low_q_by_lang.get(lang, 0.0)),
                "passed": bool(
                    n["null_rate"] == 0.0 and u["dup_est"] <= 0.01 * u["rows"]
                ),
            }
        )
    return pd.DataFrame(verdicts)


def queries() -> dict[str, Callable[[str], Any]]:
    from sod_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from sod_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
