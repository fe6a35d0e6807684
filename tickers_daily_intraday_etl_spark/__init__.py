"""PySpark-native CDC / incremental-ingest engine.

A from-scratch Structured-Streaming CDC engine (binlog/WAL tail -> lake
upsert) with the query semantics of the reference ETL repo
(lucasdavidfranco/tickers-daily-intraday-etl): keyed incremental upsert,
last-writer-wins dedup, SCD-2 merge, bounded-window analytics, idempotent
re-runnable jobs — re-expressed Spark-first over a transactional,
bucket-partitioned parquet lake table with exactly-once commit manifests.

Subpackages
-----------
lake        transactional table format (commit log, snapshots, MERGE)
cdc         change-feed schemas, generator, LWW dedup, replay oracle
streaming   Structured Streaming pipeline (readStream -> foreachBatch)
operators   reference-semantics operators (watermark filter, windows, SCD-2)
functions   training-data pipeline functions (dedup, similarity, text)
sources     testdata loaders and change-feed sources
plans       plan inspection / audit helpers
"""

__version__ = "0.1.0"
