"""cdc_extractor_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference CDC extractor
(dbestdan/cdc-extractor), rebuilt Spark-first.

The reference (see SURVEY.md) is a multi-threaded pull-based CDC extractor:
coordinator polls max(event_id), workers range-scan the audit log, enrich
with commit timestamps, advance a freshness watermark, and emit
pipe-delimited extracts plus metrics time series.  Here that dataflow is
re-expressed as declarative DataFrame plans (Catalyst optimizes; Tungsten
executes) and Structured Streaming micro-batches, and extended with the
large-scale training-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis).

Layout:
    session.py    SparkSession factory (local test defaults, scale knobs)
    io.py         fixture loaders for /root/testdata/sf* parquet tables
    config.py     table-group config (reference Config.java, de-bugged)
    queries.py    registry powering __spark_entry__.queries()/oracle_sql()
    operators/    changelog (group A), cdc (group B), star join, windows
    functions/    text analysis, dedup, similarity, json, multimodal
    sources/      changes-fixture generator, jdbc/stream source helpers
    sinks/        pipe-delimited text sink (reference chunk files)
    streaming/    micro-batch CDC pipeline, watermark + staleness metrics
"""

__version__ = "0.1.0"
