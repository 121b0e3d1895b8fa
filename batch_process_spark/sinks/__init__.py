"""Sinks (SURVEY §2.10): CSV/parquet/JSON writers, content-hash cache,
and driver-side report adapters (plot/docx, gated on optional deps).
"""

from batch_process_spark.sinks.writers import (
    cached_parquet,
    write_csv,
    write_json,
    write_parquet,
)

__all__ = ["write_csv", "write_json", "write_parquet", "cached_parquet"]
