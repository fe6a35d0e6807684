"""CDC layer: change-feed schemas, deterministic binlog generator,
last-writer-wins dedup, MERGE-into-lake-table, and the single-threaded
replay oracle used by the correctness gate (token-array equality)."""

from tickers_daily_intraday_etl_spark.cdc.schemas import CDC_SCHEMA, TARGET_SCHEMA
from tickers_daily_intraday_etl_spark.cdc.dedup import lww_dedup
from tickers_daily_intraday_etl_spark.cdc.merge import merge_into

__all__ = ["CDC_SCHEMA", "TARGET_SCHEMA", "lww_dedup", "merge_into"]
