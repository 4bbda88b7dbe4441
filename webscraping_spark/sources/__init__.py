"""Sources & storage: numpy image codecs, deterministic fixture synthesis,
and the parquet-snapshot (Iceberg-style) table layer."""
