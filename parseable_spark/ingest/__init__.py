"""Ingest pipeline: JSON normalization → schema management → DataFrame.

Mirrors the reference's event pipeline (SURVEY.md §1.2-§1.4):
flatten (reference src/utils/json/flatten.rs) → schema inference with
V1 coercions + conflict renaming (src/event/format/mod.rs) → engine
columns (p_timestamp et al., src/event/mod.rs:42-46) → Arrow-backed
DataFrame. These are pre-ingest row transforms — deliberately plain
Python, exactly as the reference does them row-wise in Rust before
columnarization; the DataFrame/Parquet layers stay fully columnar.
"""
