"""CommitLog protocol tests — pure Python (no SparkSession needed).

Pins the round-4 scale fixes: the read path resolves versions through
the ``_last_checkpoint`` pointer with a BOUNDED number of files touched
(no O(#commits) directory listing on the merge path — the class of cost
that caused the round-2 bench drift), and ``expire_log`` retention keeps
the log itself from growing without bound at 10^10-event scale.
"""

from __future__ import annotations

import json
import os

import pytest

from tickers_daily_intraday_etl_spark.lake.log import (
    CHECKPOINT_INTERVAL,
    CommitConflict,
    CommitLog,
    InMemoryLogStore,
    LocalLogStore,
    LogEntry,
    VersionNotRetained,
)


@pytest.fixture(params=["local", "memory"])
def make_log(request, tmp_path):
    """Factory for CommitLog instances over ONE shared store: 'local' is
    the filesystem store (os.link create-if-absent), 'memory' is the
    object-store-semantics double (conditional PUT, last-writer-wins
    overwrite, injected per-op latency).  The commit protocol must
    behave identically over both — that equivalence is what makes the
    LogStore interface's conditional-PUT mapping trustworthy.  Each
    make_log() call is a fresh reader/writer with cold caches."""
    path = str(tmp_path / "t")
    if request.param == "local":
        return lambda: CommitLog(path)
    store = InMemoryLogStore(latency=0.0002)
    return lambda: CommitLog(path, store=store)


class CountingStore(LocalLogStore):
    """LocalLogStore that counts every storage primitive invoked."""

    def __init__(self, root: str):
        super().__init__(root)
        self.counts = {"read": 0, "exists": 0, "list": 0, "put": 0, "delete": 0}

    def read(self, name):
        self.counts["read"] += 1
        return super().read(name)

    def exists(self, name):
        self.counts["exists"] += 1
        return super().exists(name)

    def list_names(self):
        self.counts["list"] += 1
        return super().list_names()

    def put_if_absent(self, name, data):
        self.counts["put"] += 1
        return super().put_if_absent(name, data)

    def put_overwrite(self, name, data):
        self.counts["put"] += 1
        return super().put_overwrite(name, data)

    def delete(self, name):
        self.counts["delete"] += 1
        return super().delete(name)

    @property
    def total_io(self):
        return sum(v for k, v in self.counts.items() if k != "put")


def _commit_n(log: CommitLog, n: int, start: int = 0) -> None:
    for v in range(start, start + n):
        log.try_commit(
            LogEntry(
                version=v,
                schema_json="{}",
                adds=[{"path": f"data/f{v}.parquet", "bucket": v % 4, "rows": 10,
                       "schema_version": 0}],
                removes=[],
                manifest={"batch_id": v},
            )
        )


def test_snapshot_io_bounded_on_old_table(tmp_path):
    """A COLD reader of a 200-commit table must touch O(checkpoint
    interval) files for snapshot(), with ZERO directory listings —
    at 10^6 commits a per-snapshot listdir is the per-batch cost that
    grows with table age."""
    path = str(tmp_path / "t")
    writer = CommitLog(path)
    _commit_n(writer, 200)

    store = CountingStore(os.path.join(path, "_log"))
    reader = CommitLog(path, store=store)
    snap = reader.snapshot()
    assert snap.version == 199
    assert len(snap.live_files) == 200
    assert store.counts["list"] == 0, "merge path must never LIST the log dir"
    # pointer GET + ckpt GET + <=K entry reads + <=K+2 existence probes
    assert store.total_io <= 2 * CHECKPOINT_INTERVAL + 6

    # a SECOND snapshot at the same version is served from memory with
    # only the bounded latest-version forward probe
    before = store.total_io
    reader.snapshot()
    assert store.total_io - before <= 3


def test_latest_version_probe_matches_listdir(make_log):
    log = make_log()
    assert log.latest_version() is None
    for n in (1, CHECKPOINT_INTERVAL - 1, CHECKPOINT_INTERVAL + 3, 57):
        _commit_n(log, n - (log.latest_version() + 1 if log.latest_version() is not None else 0),
                  start=(log.latest_version() + 1 if log.latest_version() is not None else 0))
        cold = make_log()
        assert cold.latest_version() == n - 1 == max(log.versions())


def test_pointer_written_at_checkpoint(make_log):
    log = make_log()
    _commit_n(log, CHECKPOINT_INTERVAL + 1)
    ptr = json.loads(log.store.read("_last_checkpoint"))
    assert ptr["version"] == CHECKPOINT_INTERVAL


def test_time_travel_below_pointer(make_log):
    """Snapshot at a version older than the newest checkpoint must
    probe checkpoint slots downward, not trust the pointer blindly."""
    log = make_log()
    _commit_n(log, 100)
    cold = make_log()
    snap = cold.snapshot(45)
    assert snap.version == 45
    assert len(snap.live_files) == 46


def test_commit_conflict_still_atomic(make_log):
    a, b = make_log(), make_log()
    _commit_n(a, 3)
    with pytest.raises(CommitConflict):
        b.try_commit(LogEntry(version=2, schema_json="{}"))


def test_concurrent_writers_interleave_without_lost_commits(make_log):
    """Two writers racing version-by-version over the SAME store: every
    version is committed by exactly one writer, the loser observes
    CommitConflict and re-reads — 60 commits land as versions 0..59 with
    no gaps and no overwrites (the memory-store variant overlaps the
    writers under injected per-op latency)."""
    import threading

    wins: dict[str, list[int]] = {"a": [], "b": []}

    def writer(name: str) -> None:
        log = make_log()
        for _ in range(30):
            while True:
                latest = log.latest_version()
                v = 0 if latest is None else latest + 1
                try:
                    log.try_commit(
                        LogEntry(version=v, schema_json="{}",
                                 adds=[{"path": f"data/{name}-{v}.parquet",
                                        "bucket": 0, "rows": 1,
                                        "schema_version": 0}],
                                 manifest={"batch_id": f"{name}-{v}"})
                    )
                    wins[name].append(v)
                    break
                except CommitConflict:
                    continue

    ts = [threading.Thread(target=writer, args=(n,)) for n in ("a", "b")]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert sorted(wins["a"] + wins["b"]) == list(range(60))
    cold = make_log()
    snap = cold.snapshot()
    assert snap.version == 59
    assert len(snap.live_files) == 60  # every writer's files survived


def test_expire_log_retention(make_log):
    log = make_log()
    _commit_n(log, 101)  # checkpoints at 20,40,60,80,100

    res = log.expire_log(retain_checkpoints=2)
    assert res["retained_floor"] == 80
    assert res["expired_checkpoints"] == 3
    # entries below 80 are gone; 80..100 remain
    assert min(log.versions()) == 80

    # current state unaffected — including the FULL epoch-fence history,
    # which the checkpoint snapshot carries
    cold = make_log()
    snap = cold.snapshot()
    assert snap.version == 100
    assert len(snap.live_files) == 101
    assert snap.committed_batch_ids == list(range(101))

    # retained-window time travel still works
    assert cold.snapshot(85).version == 85
    # below the floor: clear error, not a partial fold
    fresh = make_log()
    with pytest.raises(VersionNotRetained):
        fresh.snapshot(50)

    # writers keep committing after expiry
    _commit_n(log, 2, start=101)
    assert make_log().snapshot().version == 102


def test_expire_keeps_at_least_one_checkpoint(make_log):
    log = make_log()
    _commit_n(log, 25)
    with pytest.raises(ValueError):
        log.expire_log(retain_checkpoints=0)
    log.expire_log(retain_checkpoints=1)
    assert make_log().snapshot().version == 24


def test_expire_log_repairs_lagging_pointer(make_log):
    """A crash between a checkpoint's publish and the pointer overwrite
    (or a lost pointer race) leaves ptr < newest checkpoint.  Before
    expiry that only costs probes; after expiry a pointer below the
    retained floor would strand a FRESH reader in the deleted region —
    latest_version() resolving an expired version and snapshot()
    raising until the next checkpoint.  expire_log must revalidate the
    pointer, and latest_version must recover even if it encounters a
    stale pointer some other way."""
    log = make_log()
    _commit_n(log, 101)  # checkpoints at 20,40,60,80,100

    # simulate the crash/race: pointer lags at 20
    log.store.put_overwrite("_last_checkpoint", json.dumps({"version": 20}))

    log.expire_log(retain_checkpoints=2)  # floor 80; 20's entry+ckpt gone

    # pointer was repaired to the newest retained checkpoint
    assert json.loads(log.store.read("_last_checkpoint"))["version"] == 100
    fresh = make_log()
    assert fresh.latest_version() == 100
    assert fresh.snapshot().version == 100


def test_latest_version_recovers_from_stale_pointer_in_expired_region(make_log):
    """Belt-and-braces for the same race if the pointer is stale-written
    AFTER expiry (e.g. a delayed overwrite from a dying writer landing
    last): the forward probe starts in the deleted region and must fall
    back to a LIST instead of returning an unreconstructible version."""
    log = make_log()
    _commit_n(log, 101)
    log.expire_log(retain_checkpoints=2)  # floor 80
    # delayed stale overwrite lands after expiry
    log.store.put_overwrite("_last_checkpoint", json.dumps({"version": 20}))

    fresh = make_log()
    assert fresh.latest_version() == 100
    assert fresh.snapshot().version == 100


def test_healthy_pointer_never_pays_list_fallback(tmp_path):
    path = str(tmp_path / "t")
    log = CommitLog(path)
    _commit_n(log, 101)
    log.expire_log(retain_checkpoints=2)
    store = CountingStore(os.path.join(path, "_log"))
    healthy = CommitLog(path, store=store)
    store.counts["list"] = 0
    assert healthy.snapshot().version == 100
    assert store.counts["list"] == 0


def test_lost_pointer_overwrite_race_is_survivable(tmp_path):
    """Object-store pointer race, injected: the checkpoint at v100
    publishes but its pointer overwrite LOSES to a concurrent stale PUT
    (InMemoryLogStore.lose_next_overwrite).  Readers must still resolve
    the true latest (bounded forward probes from the stale pointer), and
    expire_log must repair the pointer rather than strand them."""
    store = InMemoryLogStore(latency=0.0002)
    path = "mem://t"
    log = CommitLog(path, store=store)
    _commit_n(log, 81)  # pointer now 80
    store.lose_next_overwrite("_last_checkpoint")
    _commit_n(log, 20, start=81)  # ckpt-100 publishes; pointer PUT lost
    assert json.loads(store.read("_last_checkpoint"))["version"] == 80

    fresh = CommitLog(path, store=store)
    assert fresh.latest_version() == 100  # probes forward past the stale ptr
    assert fresh.snapshot().version == 100

    log.expire_log(retain_checkpoints=1)  # floor 100
    assert json.loads(store.read("_last_checkpoint"))["version"] == 100
    cold = CommitLog(path, store=store)
    assert cold.snapshot().version == 100
    assert cold.snapshot().committed_batch_ids == list(range(101))


def test_latest_version_recovers_when_pointer_missing_after_expiry(make_log):
    """ADVICE r05: an expired log whose _last_checkpoint file is GONE
    (lost overwrite at the first checkpoint, or a crash inside
    expire_log before the round-6 repair-first ordering) must not read
    as an empty table — the floor<0 branch takes the same one-LIST
    recovery as the stale-pointer case."""
    log = make_log()
    _commit_n(log, 101)
    log.expire_log(retain_checkpoints=2)  # floor 80; v0 long gone
    log.store.delete("_last_checkpoint")

    fresh = make_log()
    assert fresh.latest_version() == 100
    assert fresh.snapshot().version == 100
    assert fresh.snapshot().committed_batch_ids == list(range(101))


def test_expire_log_repairs_pointer_before_deleting(tmp_path):
    """Crash-ordering guard: expire_log must overwrite a lagging pointer
    BEFORE it starts deleting entries, so a crash mid-expiry can never
    leave a dangling pointer over a deleted region.  Asserted by
    ordering of storage ops, not by injecting a crash."""
    path = str(tmp_path / "t")
    log = CommitLog(path)
    _commit_n(log, 101)
    log.store.put_overwrite("_last_checkpoint", json.dumps({"version": 20}))

    ops: list[tuple[str, str]] = []
    orig_put, orig_del = log.store.put_overwrite, log.store.delete

    def spy_put(name, data):
        ops.append(("put", name))
        return orig_put(name, data)

    def spy_del(name):
        ops.append(("delete", name))
        return orig_del(name)

    log.store.put_overwrite, log.store.delete = spy_put, spy_del
    log.expire_log(retain_checkpoints=2)
    first_delete = next(i for i, (op, _) in enumerate(ops) if op == "delete")
    pointer_put = next(
        i for i, (op, n) in enumerate(ops) if op == "put" and n == "_last_checkpoint"
    )
    assert pointer_put < first_delete
