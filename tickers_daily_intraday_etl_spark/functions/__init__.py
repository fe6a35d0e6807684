"""Training-data pipeline functions over document/embedding tables.

Everything here is expressed with built-in ``pyspark.sql.functions``
(JVM-side, whole-stage-codegen) wherever possible; pandas/Arrow UDFs
appear only for kernels the built-ins cannot express (rolling hashes,
binary decode).  Hash formulations are deliberately chosen to be
mirror-expressible in ANSI SQL (md5-hex -> bigint) so every operator can
be validated against the DuckDB oracle.
"""

from tickers_daily_intraday_etl_spark.functions import dedupe, similarity, text

__all__ = ["text", "dedupe", "similarity"]
