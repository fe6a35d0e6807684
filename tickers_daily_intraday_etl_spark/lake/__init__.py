"""Transactional lake-table format (from-scratch, Iceberg-shaped semantics).

No Iceberg/Delta jar exists in this environment, so the engine implements
the table-format layer itself: immutable parquet data files + an atomic
JSON commit log providing snapshot isolation, schema evolution
(add / widen on write), time travel, bucket partition pruning for
key-partitioned MERGE, and commit manifests for exactly-once epoch fencing.
"""

from tickers_daily_intraday_etl_spark.lake.log import CommitLog, LogEntry
from tickers_daily_intraday_etl_spark.lake.table import LakeTable

__all__ = ["CommitLog", "LogEntry", "LakeTable"]
