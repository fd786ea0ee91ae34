"""PySpark-native analytics engine with the query and data-processing
capabilities of yamakii/garmin-performance-analysis.

The reference system is a single-node DuckDB-backed analytics stack
(21 domain tables, ~57 query tools, a stats/ML layer).  This package
re-expresses that capability surface Spark-first:

- ``sources``   : parquet/JSON readers with explicit schemas (bronze layer)
- ``operators`` : generic relational/window/stats operators (SURVEY.md §2)
- ``functions`` : scalar column-expression helpers (unit conversions, bands)
- ``pipelines`` : large-scale data-pipeline ops (dedup, similarity, text)
- ``plans``     : plan-inspection helpers (pushdown/broadcast assertions)
- ``streaming`` : incremental / watermark-style ingest
- ``harness``   : the query catalog wired to the driver test tables

Everything is DataFrame/Spark-SQL first so Catalyst handles pushdown,
pruning, and join strategy; Pandas UDFs are used only where built-in
operators cannot express the semantics (grouped model fits).
"""

__version__ = "0.1.0"
