"""blueforty-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of ziyanz0322/BlueForty---ETL-Data-Pipeline.

The reference (``/root/reference/BlueForty.py``) is an imperative Snowflake
ETL script; this package re-expresses every capability it exercises as an
idiomatic, reusable Spark DataFrame / Spark SQL operator library, designed
for partition-parallel execution at large scale:

- ``sources``   — CSV/TSV/XML/JDBC ingestion with error tolerance, multi-token
  null sentinels, positional selection, and per-row file-metadata columns
  (reference: BlueForty.py:23-116, :130-176, :312-360, :392-422).
- ``functions`` — the scalar layer: try-casts, NULLIF/COALESCE/TRIM, ZIP5
  normalization, int→bool, haversine distance, schema inference, plus
  text-analysis and vector primitives for large-scale pipeline work.
- ``operators`` — relational operators: grouped aggregation views, USING /
  composite-key / broadcast-cross joins, window top-1-per-group, dedup
  (exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity search, and
  multimodal binary-column plumbing.
- ``plans``     — reference-analog pipeline compositions (EP1/EP2/EP3).
- ``streaming`` — event-time tumbling/sliding/session window shapes, batch
  first, re-exposable via Structured Streaming.

Nothing here is a port: the reference delegates all execution to Snowflake;
here Catalyst + Tungsten own the physical plan and every operator is written
so predicate pushdown, column pruning, partial aggregation, and broadcast
selection apply.
"""

__version__ = "0.1.0"
