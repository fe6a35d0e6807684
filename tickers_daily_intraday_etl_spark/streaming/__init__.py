from tickers_daily_intraday_etl_spark.streaming.pipeline import CdcPipeline

__all__ = ["CdcPipeline"]
