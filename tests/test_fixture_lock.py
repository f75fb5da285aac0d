"""Cross-process fixture build lock (ADVICE r8): concurrent sessions
sharing /tmp/mape_spark_fixtures (bench + pytest) must not wipe each
other's in-progress builds. ``_fixture_ready`` returning False holds
an O_EXCL ``<path>.lock`` until the matching ``_mark_fixture_ready``;
racers block, then observe ``_COMPLETE`` and reuse the finished
fixture. No SparkSession needed — the guard is pure filesystem."""

import multiprocessing
import os
import time

import __spark_entry__ as entrymod


def _racer(path, build_sleep, q):
    # re-import in the child for a clean _FIXTURE_BUILD_LOCKS
    import __spark_entry__ as e

    if not e._fixture_ready(path):
        os.makedirs(path, exist_ok=True)
        time.sleep(build_sleep)  # widen the race window
        with open(os.path.join(path, "data"), "w") as fh:
            fh.write("built\n")
        e._mark_fixture_ready(path)
        q.put("built")
    else:
        q.put("reused")


def test_exactly_one_builder_wins_the_race(tmp_path):
    path = str(tmp_path / "fx")
    q = multiprocessing.Queue()
    procs = [
        multiprocessing.Process(target=_racer, args=(path, 0.5, q))
        for _ in range(3)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(30)
    results = sorted(q.get(timeout=5) for _ in procs)
    assert results == ["built", "reused", "reused"], results
    # the winner's build survived intact and the lock was released
    assert open(os.path.join(path, "data")).read() == "built\n"
    assert os.path.exists(os.path.join(path, "_COMPLETE"))
    assert not os.path.exists(path + ".lock")


def test_half_build_is_wiped_and_lock_cycle_is_reentrant(tmp_path):
    path = str(tmp_path / "fx2")
    # crashed half-build: dir exists, no _COMPLETE
    os.makedirs(path)
    with open(os.path.join(path, "partial"), "w") as fh:
        fh.write("junk\n")
    assert entrymod._fixture_ready(path) is False
    assert not os.path.exists(os.path.join(path, "partial"))  # wiped
    assert os.path.exists(path + ".lock")  # build lock held
    # same-process retry after a failed build must not self-deadlock
    assert entrymod._fixture_ready(path) is False
    os.makedirs(path, exist_ok=True)
    entrymod._mark_fixture_ready(path)
    assert not os.path.exists(path + ".lock")
    assert entrymod._fixture_ready(path) is True


def test_stale_lock_from_crashed_holder_is_broken(tmp_path):
    path = str(tmp_path / "fx3")
    lock = path + ".lock"
    os.makedirs(os.path.dirname(lock), exist_ok=True)
    with open(lock, "w") as fh:
        fh.write("99999999\n")
    stale = time.time() - entrymod._FIXTURE_LOCK_STALE_S - 5
    os.utime(lock, (stale, stale))
    t0 = time.monotonic()
    assert entrymod._fixture_ready(path) is False  # broke the stale lock
    assert time.monotonic() - t0 < 5
    os.makedirs(path, exist_ok=True)
    entrymod._mark_fixture_ready(path)
    assert entrymod._fixture_ready(path) is True
