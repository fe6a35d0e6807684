"""SCD-2 dimension maintenance as a single-pass merge.

Reference: analytics/etl_dim_analytics.py:142-211 — a 4-statement dance
(temp table -> retire changed -> touch unchanged -> insert new) keyed by
a SHA-1 hash of all attributes (utils/db_utils.py:58-69).  Here the whole
thing is one DataFrame transform over (current dim) x (update batch):

* changed key    -> old version retired (is_current=0, date_to=yesterday),
  new version inserted (is_current=1, date_to=2099-12-31)
* unchanged key  -> row kept as-is (the reference only refreshes
  audit_datetime, which is excluded from equality checks anyway)
* new key        -> inserted as current
* absent-from-batch keys -> untouched

Spark-first: implemented as union + window over key — one shuffle; the
reference's retire/touch/insert statements were three separate scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_TIME = "2099-12-31"  # reference: analytics/etl_dim_analytics.py:204-205


def surrogate_key(*cols: str, algo: str = "sha1") -> F.Column:
    """Version-identity hash over all attributes.

    The reference concatenates str(col) values with NO delimiter and
    SHA-1s them (utils/db_utils.py:58-69) — delimiter-free concat is
    ambiguity-prone ('a','bc' == 'ab','c') but is replicated exactly so
    hashes match an equivalent oracle expression.  ``algo='md5'`` is the
    oracle-parity variant (DuckDB has no sha1).

    NULL contract: a NULL in ANY attribute yields a NULL key — the same
    semantics as SQL's NULL-propagating ``||`` concatenation, so hash
    parity with an oracle holds row-for-row.  (``concat_ws`` would
    silently SKIP nulls instead, making ('a', NULL) collide with ('a',);
    callers who want the reference's pandas ``str(None) == 'None'``
    behavior must coalesce before hashing.)
    """
    concat = F.concat(*[F.col(c).cast("string") for c in cols])
    return F.md5(concat) if algo == "md5" else F.sha1(concat)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: list[str],
    effective_date,
    hash_algo: str = "sha1",
    attr_truncate: int | None = None,
) -> DataFrame:
    """Return the new dimension state after applying ``updates``.

    ``dim`` columns: key, attrs, subrogate_key, date_from, date_to,
    is_current.  ``updates`` columns: key + attrs (one row per key).
    ``effective_date`` is the batch's business date (a date literal —
    nondeterministic now()/today() is kept out of the data path).

    ``attr_truncate`` mirrors the reference's app-side VARCHAR(n)
    truncation of incoming dim attributes before compare/insert
    (reference: analytics/etl_dim_analytics.py:89, ``.str.slice(0,50)``):
    every attribute of ``updates`` is cut to the first n characters, so
    the surrogate key and the stored values both see the truncated form.
    """
    eff = F.lit(effective_date).cast("date")
    if attr_truncate is not None:
        updates = updates.select(
            key_col,
            *[F.substring(F.col(c), 1, attr_truncate).alias(c) for c in attr_cols],
        )
    upd = updates.select(
        key_col,
        *attr_cols,
        surrogate_key(key_col, *attr_cols, algo=hash_algo).alias("subrogate_key"),
        eff.alias("date_from"),
        F.lit(END_OF_TIME).cast("date").alias("date_to"),
        F.lit(1.0).alias("is_current"),
    )
    # current rows whose key+hash match an update: unchanged ("touch")
    # current rows whose key matches but hash differs: retire
    cur = dim.where(F.col("is_current") == 1.0)
    hist = dim.where(F.col("is_current") != 1.0)

    upd_keys = upd.select(
        F.col(key_col).alias("__k"), F.col("subrogate_key").alias("__sk")
    )
    marked = cur.join(
        F.broadcast(upd_keys), (F.col(key_col) == F.col("__k")), "left"
    )
    # NULL-safe hash comparisons: surrogate_key propagates NULL attrs to a
    # NULL hash (see above), and a plain !=/== against a NULL hash is NULL —
    # which would drop the current row from BOTH branches (silent history
    # loss) while the anti-join re-inserts it every batch.  eqNullSafe makes
    # retire/touch/insert a partition of the key space again: NULL-vs-value
    # retires, NULL-vs-NULL touches, and the re-run is idempotent.
    retired = (
        marked.where(
            F.col("__k").isNotNull() & ~F.col("subrogate_key").eqNullSafe(F.col("__sk"))
        )
        .drop("__k", "__sk")
        .withColumn("is_current", F.lit(0.0))
        .withColumn("date_to", F.date_sub(eff, 1))  # yesterday (ref :163)
    )
    unchanged = marked.where(
        F.col("__k").isNull() | F.col("subrogate_key").eqNullSafe(F.col("__sk"))
    ).drop("__k", "__sk")
    # insert new versions only for keys that are new or changed
    # (reference :177-210 NOT EXISTS on the hash; the hash already encodes
    # the key, so adding the key equi-condition changes nothing for
    # non-NULL hashes — but it stops a NULL-hash update of key A from
    # being swallowed by an unrelated NULL-hash current row of key B)
    inserts = upd.join(
        cur.select(
            F.col(key_col).alias("__ek"), F.col("subrogate_key").alias("__existing")
        ),
        (upd[key_col] == F.col("__ek"))
        & upd["subrogate_key"].eqNullSafe(F.col("__existing")),
        "left_anti",
    )
    cols = dim.columns
    return (
        hist.select(*cols)
        .unionByName(retired.select(*cols))
        .unionByName(unchanged.select(*cols))
        .unionByName(inserts.select(*cols))
    )
