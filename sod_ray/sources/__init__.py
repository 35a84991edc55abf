"""Sources: the deterministic Common-Crawl-style web-table synthesizer
and parquet read helpers."""
