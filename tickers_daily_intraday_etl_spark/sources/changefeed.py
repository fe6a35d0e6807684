"""Change-feed sources: the binlog/WAL tail in parquet, JSON-lines, or
CSV shape, batch or streaming.

Maps the reference's HTTP pollers (S1/S2: staging/extract_staging_data.py:12-129,
S3: analytics/etl_dim_analytics.py:12-56) onto declarative file-stream
sources: the poll loop becomes checkpointed offset tracking, `compact` vs
`full` fetch (staging/extract_staging_data.py:47-53) becomes
resume-from-checkpoint vs fresh-checkpoint replay.

All readers take an explicit schema (no inference in prod paths) and
normalize to the CDC envelope: op/doc_id/lsn/commit_ts + payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tickers_daily_intraday_etl_spark.cdc.schemas import CDC_SCHEMA


def _string_view_of(schema: T.StructType) -> T.StructType:
    """CSV carries everything as strings; cast back per target schema."""
    return T.StructType([T.StructField(f.name, T.StringType(), True) for f in schema.fields])


def _cast_to(df: DataFrame, schema: T.StructType) -> DataFrame:
    # string->typed casts with NULL-on-malformed semantics, mirroring the
    # reference's pd.to_numeric(errors='coerce') (transform_staging_data.py:46)
    return df.select(
        *[
            F.col(f.name).try_cast(f.dataType).alias(f.name)
            for f in schema.fields
        ]
    )


def read_feed(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType = CDC_SCHEMA,
    streaming: bool = False,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read a change feed directory in any supported shape."""
    options = dict(options or {})
    reader = spark.readStream if streaming else spark.read
    if fmt == "parquet":
        return reader.schema(schema).options(**options).parquet(path)
    if fmt == "json":
        return reader.schema(schema).options(**options).json(path)
    if fmt == "csv":
        options.setdefault("header", "true")
        raw = reader.schema(_string_view_of(schema)).options(**options).csv(path)
        return _cast_to(raw, schema)
    raise ValueError(f"unsupported feed format: {fmt}")


def write_feed(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "append") -> None:
    if fmt == "parquet":
        df.write.mode(mode).parquet(path)
    elif fmt == "json":
        df.write.mode(mode).json(path)
    elif fmt == "csv":
        df.select([F.col(c).cast("string") for c in df.columns]).write.mode(mode).option(
            "header", "true"
        ).csv(path)
    else:
        raise ValueError(f"unsupported feed format: {fmt}")
