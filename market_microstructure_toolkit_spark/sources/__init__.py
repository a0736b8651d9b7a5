"""Sources & sinks for book snapshot tables (SURVEY §2.1)."""

from market_microstructure_toolkit_spark.sources.book_io import (  # noqa: F401
    read_book_csv,
    read_book_parquet,
    write_book_csv,
    write_book_parquet,
    write_summary_append,
)
