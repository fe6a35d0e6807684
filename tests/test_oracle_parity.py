"""Mirror of the driver's correctness harness: run every queries() entry
and its oracle_sql() through DuckDB on the same parquet tables, compare
row count + column names + order-insensitive values.

Runs at sf0.001 for speed (the driver uses sf0.01; parity at one SF
implies the formulations agree — both are pure functions of the data).
"""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm_cell(v):
    """Type-tagged normalization: int vs float vs Decimal are DISTINCT,
    matching the driver's strict value-hash (a DuckDB HUGEINT that
    materializes as float64/Decimal must NOT silently equal a Spark
    BIGINT — that class of oracle type bug has to fail locally)."""
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        return ("float", "nan" if math.isnan(v) else round(v, 9))
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, str):
        return ("str", v)
    return (type(v).__name__, str(v))


def _rowset(rows, cols):
    out = []
    for r in rows:
        d = dict(zip(cols, r))
        out.append(tuple(_norm_cell(d[c]) for c in sorted(cols)))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    # fetch via Arrow (like the driver), not fetchall(): Arrow surfaces
    # DuckDB's HUGEINT as Decimal instead of coercing it to Python int,
    # so oracle type mismatches are visible here before the driver sees them
    tbl = duck.execute(entry_mod.oracle_sql()[name]).fetch_arrow_table()
    duck_cols = tbl.column_names
    duck_rows = [tuple(d[c] for c in duck_cols) for d in tbl.to_pylist()]

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    got = _rowset(spark_rows, spark_cols)
    exp = _rowset(duck_rows, duck_cols)
    mismatches = [i for i, (g, e) in enumerate(zip(got, exp)) if g != e]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first: "
        f"{got[mismatches[0]]} vs {exp[mismatches[0]]}"
    )


def test_every_query_has_an_oracle():
    """Round 3 closed the last rows-only row (cdc_lineage_metrics now
    exports SQL-derivable columns + invariant booleans) — keep it closed."""
    missing = set(entry_mod.queries()) - set(entry_mod.oracle_sql())
    assert not missing, missing


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "tokens_csv", "n_tok", "source"}
