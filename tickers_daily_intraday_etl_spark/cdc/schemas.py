"""Change-feed and target schemas.

The envelope generalizes the reference's per-ticker incremental rows
(reference: staging/create_staging_tables.py:17-40 declares the target;
staging/transform_staging_data.py:47-62 implements watermark upsert
semantics keyed by (ticker, event_date)).  Here the key is ``doc_id``,
the version is an LSN, and the payload is a pre-tokenized training
sequence per the input hint (doc_id:string, tokens:array<int32>,
n_tok:int32, source:string).
"""

from __future__ import annotations

from pyspark.sql import types as T

OP_COL = "op"  # 'I' | 'U' | 'D'
KEY_COL = "doc_id"
LSN_SRC_COL = "lsn"
COMMIT_TS_SRC_COL = "commit_ts"

# Payload (the target table's user-visible schema).
TARGET_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

# Change-event envelope = op/lsn/commit_ts + payload.
CDC_SCHEMA = T.StructType(
    [
        T.StructField(OP_COL, T.StringType(), False),
        T.StructField(KEY_COL, T.StringType(), False),
        T.StructField(LSN_SRC_COL, T.LongType(), False),
        T.StructField(COMMIT_TS_SRC_COL, T.TimestampType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

# Schema-evolution variant: a new int column appears mid-stream.
CDC_SCHEMA_V2 = T.StructType(
    CDC_SCHEMA.fields + [T.StructField("source_version", T.IntegerType(), True)]
)

ENVELOPE_COLS = (OP_COL, LSN_SRC_COL, COMMIT_TS_SRC_COL)


def payload_fields(schema: T.StructType) -> list[T.StructField]:
    """Everything in a change-event schema except the envelope."""
    return [f for f in schema.fields if f.name not in ENVELOPE_COLS]
