"""market_microstructure_toolkit_spark — a PySpark-native market
microstructure analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
``Gruntrexpewrus/market-microstructure-toolkit`` (a single-node pandas
toolkit) on Apache Spark. The reference defines WHAT is computed (the
operator semantics: spread/mid/microprice/imbalance/OFI/realized-variance
metrics, depth analytics, TWAP/VWAP execution simulation over L2 order-book
snapshots); this package defines HOW on Spark: lazy DataFrame plans,
Catalyst-optimizable expressions, window specs, and higher-order array
functions — zero Python UDFs on the hot path.

Layout
------
- ``schema``     : parametric book schema (8 + 4K columns), wide<->nested
- ``sources``    : CSV/Parquet readers & writers with the reference's
                   missing-value conventions
- ``functions``  : Column-level metric expressions (null-propagating)
- ``operators``  : DataFrame -> DataFrame transforms (metrics bundles,
                   window/series ops, depth analytics, impact simulators,
                   dedup / similarity / text analysis for data pipelines)
- ``plans``      : named query definitions + DuckDB oracle SQL
- ``streaming``  : Structured Streaming analogs of the live recorder
"""

__version__ = "0.1.0"

from market_microstructure_toolkit_spark.session import get_spark  # noqa: F401
