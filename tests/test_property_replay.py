"""Property-based correctness: random feed shapes -> engine final state
must equal the single-threaded replay oracle (token-array equality).

Hypothesis generates feed parameters (sizes, skew, delete/dup/tie rates,
segmentation); the engine applies the feed batch-by-batch through
merge_into; the oracle replays it in total order.
"""

import os

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tickers_daily_intraday_etl_spark.cdc.feedgen import generate_feed
from tickers_daily_intraday_etl_spark.cdc.merge import merge_into
from tickers_daily_intraday_etl_spark.cdc.oracle import final_state_frame
from tickers_daily_intraday_etl_spark.cdc.schemas import CDC_SCHEMA, TARGET_SCHEMA
from tickers_daily_intraday_etl_spark.lake import LakeTable


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 10_000),
    n_events=st.integers(200, 1200),
    n_docs=st.integers(10, 120),
    p_delete=st.floats(0.0, 0.3),
    p_duplicate=st.floats(0.0, 0.2),
    p_lsn_tie=st.floats(0.0, 0.1),
    n_batches=st.integers(1, 4),
    num_buckets=st.sampled_from([1, 4, 16]),
    salt=st.sampled_from([0, 4]),
    modes=st.sampled_from([("cow",), ("mor",), ("cow", "mor"), ("mor", "cow")]),
)
def test_engine_matches_oracle_on_random_feeds(
    spark, tmpdir_path, seed, n_events, n_docs, p_delete, p_duplicate, p_lsn_tie,
    n_batches, num_buckets, salt, modes,
):
    events = generate_feed(
        n_events=n_events, n_docs=n_docs, seed=seed,
        p_delete=p_delete, p_duplicate=p_duplicate, p_lsn_tie=p_lsn_tie,
    )
    table = LakeTable.create_if_not_exists(
        spark, os.path.join(tmpdir_path, f"t{seed}_{n_events}_{num_buckets}"),
        TARGET_SCHEMA, num_buckets=num_buckets,
    )
    bounds = [int(len(events) * i / n_batches) for i in range(n_batches + 1)]
    for b in range(n_batches):
        chunk = events.iloc[bounds[b] : bounds[b + 1]]
        sdf = spark.createDataFrame(chunk, schema=CDC_SCHEMA)  # Arrow path
        merge_into(table, sdf, batch_id=b, salt_partitions=salt,
                   mode=modes[b % len(modes)])

    got = {
        r["doc_id"]: (None if r["tokens"] is None else list(r["tokens"]))
        for r in table.read().collect()
    }
    oracle = final_state_frame(events)
    exp = {
        r["doc_id"]: (None if r["tokens"] is None else list(r["tokens"]))
        for _, r in oracle.iterrows()
    }
    assert got == exp
