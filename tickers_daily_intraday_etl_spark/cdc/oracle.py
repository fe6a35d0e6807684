"""Single-threaded Python replay oracle — the correctness reference.

Applies the change stream in the engine's total order
(lsn, commit_ts, payload fingerprint) per key and returns the final
state as a dict.  The engine's final table state must match this
per-row with token-array equality (the north-rule gate), after both a
full replay and a kill + resume-from-checkpoint run.

This plays the role the reference repo's Redshift end-state would play
(reference: staging/transform_staging_data.py:62 — strict ``>`` watermark
means the highest event per key wins there too).
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np
import pandas as pd


def _fingerprint(row: dict[str, Any]) -> str:
    def norm(v):
        if isinstance(v, np.ndarray):
            return v.tolist()
        if isinstance(v, (np.integer,)):
            return int(v)
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if v is pd.NA or (v is None):
            return None
        return v

    return json.dumps({k: norm(v) for k, v in sorted(row.items())}, sort_keys=True)


def replay(events: pd.DataFrame) -> dict[str, dict[str, Any]]:
    """Replay the feed; return {doc_id: final payload row} (no tombstones).

    Contract: within one key, (lsn, commit_ts) must uniquely determine the
    payload — true of real CDC feeds, where the LSN identifies a committed
    transaction.  The engine breaks exact (lsn, commit_ts) ties with a
    content fingerprint whose ordering the oracle cannot reproduce, so a
    feed violating the contract is rejected here rather than silently
    diverging."""
    state: dict[str, tuple[tuple, dict[str, Any], str]] = {}
    payload_cols = [c for c in events.columns if c not in ("op", "lsn", "commit_ts")]
    for row in events.itertuples(index=False):
        d = row._asdict()
        key = d["doc_id"]
        payload = {c: d.get(c) for c in payload_cols}
        fp = _fingerprint({**payload, "op": d["op"]})
        order = (int(d["lsn"]), d["commit_ts"])
        prev = state.get(key)
        if prev is not None and order == prev[0] and fp != prev[2]:
            raise ValueError(
                f"feed violates the CDC tie contract: key {key!r} has two "
                f"different events at lsn={d['lsn']} commit_ts={d['commit_ts']}"
            )
        if prev is None or order > prev[0]:
            state[key] = (order, payload if d["op"] != "D" else None, fp)
    return {k: v[1] for k, v in state.items() if v[1] is not None}


def final_state_frame(events: pd.DataFrame) -> pd.DataFrame:
    """Oracle final state as a sorted pandas frame for comparisons."""
    rows = []
    for doc_id, payload in replay(events).items():
        r = dict(payload)
        r["doc_id"] = doc_id
        if isinstance(r.get("tokens"), np.ndarray):
            r["tokens"] = r["tokens"].tolist()
        rows.append(r)
    if not rows:
        return pd.DataFrame(columns=["doc_id"])
    return pd.DataFrame(rows).sort_values("doc_id").reset_index(drop=True)
