"""Cooperative chip arbitration (utils/chiplock.py): bench.py holds a lock
for its timed window; queue scripts pause between step blocks while it is
fresh and ignore stale locks from crashed benches."""
import os
import time

from denet_tpu.utils import chiplock


def test_lock_lifecycle(tmp_path):
    path = str(tmp_path / "bench.lock")
    busy = str(tmp_path / "queue.busy")   # isolate from any real queue
    assert chiplock.lock_age(path) is None
    with chiplock.bench_lock(path, busy_path=busy):
        age = chiplock.lock_age(path)
        assert age is not None and age < 5.0
    assert chiplock.lock_age(path) is None
    assert not os.path.exists(path)


def test_queue_busy_marker_lifecycle(tmp_path):
    busy = str(tmp_path / "queue.busy")
    with chiplock.queue_busy(busy):
        assert chiplock.lock_age(busy) is not None
    assert not os.path.exists(busy)


def test_bench_waits_for_fresh_busy_marker(tmp_path):
    """A bench arriving mid-queue-block waits (bounded) for the block to
    finish before taking the lock (ADVICE round 3, item 4)."""
    path = str(tmp_path / "bench.lock")
    busy = str(tmp_path / "queue.busy")
    with open(busy, "w") as f:
        f.write("row in flight")
    msgs = []
    t0 = time.time()
    with chiplock.bench_lock(path, log=msgs.append, busy_path=busy,
                             busy_max_wait_s=0.2, busy_poll_s=0.05):
        waited = time.time() - t0
    assert waited >= 0.2                  # held for the whole (tiny) budget
    assert msgs and "busy" in msgs[0]
    # stale marker (crashed queue block): no wait
    old = time.time() - 3600
    os.utime(busy, (old, old))
    t0 = time.time()
    with chiplock.bench_lock(path, busy_path=busy,
                             busy_max_wait_s=5.0, busy_poll_s=0.05):
        assert time.time() - t0 < 1.0


def test_yield_no_lock_returns_immediately(tmp_path):
    path = str(tmp_path / "bench.lock")
    t0 = time.time()
    assert chiplock.yield_to_bench(path) == 0.0
    assert time.time() - t0 < 0.5


def test_yield_waits_while_fresh_then_resumes(tmp_path):
    path = str(tmp_path / "bench.lock")
    with open(path, "w") as f:
        f.write("held")
    msgs = []
    waited = chiplock.yield_to_bench(path, poll_s=0.05, max_wait_s=0.2,
                                     log=msgs.append)
    assert waited >= 0.2          # held for the whole (tiny) budget
    assert msgs and "bench lock" in msgs[0]
    os.remove(path)
    assert chiplock.yield_to_bench(path, poll_s=0.05) == 0.0


def test_dead_holder_lock_is_void(tmp_path):
    """A lock whose recorded pid no longer exists is void immediately —
    a SIGKILLed bench (timeout grace expiry) must not freeze the queue
    for the whole staleness window (round-4 postmortem)."""
    path = str(tmp_path / "bench.lock")
    with open(path, "w") as f:
        f.write("999999999 0.0")           # pid far above pid_max
    assert chiplock.lock_age(path) is None
    assert chiplock.yield_to_bench(path, poll_s=0.05) == 0.0
    # a live holder's lock still counts
    with open(path, "w") as f:
        f.write("%d 0.0" % os.getpid())
    assert chiplock.lock_age(path) is not None


def test_stale_lock_ignored(tmp_path):
    path = str(tmp_path / "bench.lock")
    with open(path, "w") as f:
        f.write("crashed bench")
    old = time.time() - 3600
    os.utime(path, (old, old))
    assert chiplock.yield_to_bench(path, stale_s=60, poll_s=0.05) == 0.0


def test_overlapping_holders_do_not_void_each_other(tmp_path):
    """Two holders of the same marker (e.g. two queue blocks overlapping,
    or an accidental concurrent bench) write per-holder files: one exiting
    must not delete or clobber the other's still-active marker (a shared
    file reopened the bench-vs-queue race the arbitration closes)."""
    path = str(tmp_path / "queue.busy")
    a = chiplock.queue_busy(path)
    b = chiplock.queue_busy(path)
    a.__enter__()
    b.__enter__()
    assert chiplock.lock_age(path) is not None
    a.__exit__(None, None, None)
    # b still holds: the marker must remain visible
    assert chiplock.lock_age(path) is not None
    b.__exit__(None, None, None)
    assert chiplock.lock_age(path) is None


def test_dead_per_holder_files_are_reaped(tmp_path):
    path = str(tmp_path / "queue.busy")
    with open(path + ".999999999.0", "w") as f:
        f.write("999999999 0.0")
    assert chiplock.lock_age(path) is None
    assert not os.path.exists(path + ".999999999.0")
