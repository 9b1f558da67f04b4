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


def test_chip_lease_lifecycle_and_reentry(tmp_path):
    path = str(tmp_path / "chip.lease")
    lease = chiplock.chip_lease("t", path=path, enabled=True)
    with lease:
        assert os.path.exists(path)
        with open(path) as f:
            assert int(f.read().split()[0]) == os.getpid()
        # re-entrant: a second enter by the SAME process is a no-op that
        # must not steal ownership (exit of the inner one keeps the file)
        inner = chiplock.chip_lease("t2", path=path, enabled=True)
        with inner:
            assert not inner._owned
        assert os.path.exists(path)
    assert not os.path.exists(path)


def test_chip_lease_disabled_on_cpu(tmp_path, monkeypatch):
    # the test suite itself runs with JAX_PLATFORMS=cpu (conftest), so the
    # default-constructed lease must be a no-op that touches nothing
    path = str(tmp_path / "chip.lease")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    with chiplock.chip_lease("t", path=path):
        assert not os.path.exists(path)


def test_chip_lease_contention_waits_then_refuses(tmp_path):
    """A second live holder makes acquisition queue (bounded) and then raise
    ChipBusyError — never attach a second TPU client (VERDICT r4 item 6)."""
    import multiprocessing as mp
    import pytest

    path = str(tmp_path / "chip.lease")
    hold = mp.Event()
    release = mp.Event()

    def holder():
        with chiplock.chip_lease("holder", path=path, enabled=True):
            hold.set()
            release.wait(timeout=30)

    proc = mp.Process(target=holder)
    proc.start()
    try:
        assert hold.wait(timeout=10)
        msgs = []
        t0 = time.time()
        with pytest.raises(chiplock.ChipBusyError):
            chiplock.chip_lease("second", path=path, wait_s=0.3, poll_s=0.05,
                                log=msgs.append, enabled=True).__enter__()
        assert time.time() - t0 >= 0.3       # queued for the budget first
        assert msgs and "queueing" in msgs[0]
    finally:
        release.set()
        proc.join(timeout=10)
    # holder exited cleanly: the lease is free again, acquisition immediate
    with chiplock.chip_lease("third", path=path, enabled=True):
        pass


def test_chip_lease_reaps_dead_holder(tmp_path):
    """A SIGKILLed holder (file left behind, pid dead) must not block the
    next acquirer — same dead-pid reap as the other markers."""
    path = str(tmp_path / "chip.lease")
    with open(path, "w") as f:
        f.write("999999999 %f ghost" % time.time())   # no such pid
    t0 = time.time()
    with chiplock.chip_lease("t", path=path, enabled=True):
        assert time.time() - t0 < 1.0
        with open(path) as f:
            assert int(f.read().split()[0]) == os.getpid()


def test_chip_lease_acquire_waits_out_bench(tmp_path):
    """No new TPU client may attach while a bench window is live: lease
    acquisition first yields to a fresh bench lock."""
    bench = str(tmp_path / "bench.lock")
    path = str(tmp_path / "chip.lease")
    with open(bench, "w") as f:
        f.write("%d %f" % (os.getpid(), time.time()))
    import threading

    t_acquired = []

    def acquirer():
        with chiplock.chip_lease("t", path=path, bench_path=bench,
                                 enabled=True, poll_s=0.05):
            t_acquired.append(time.time())

    th = threading.Thread(target=acquirer)
    th.start()
    time.sleep(0.4)
    assert not t_acquired                    # still waiting on the bench
    os.remove(bench)
    th.join(timeout=30)
    assert t_acquired


def test_bench_mid_block_overlap(tmp_path):
    """The round-4 headline contamination case: a bench arriving MID-block
    must wait for the block's fresh busy marker (now bounded above the
    longest real block), and the queue's next block must not start while
    the bench lock is held."""
    import threading

    lock = str(tmp_path / "bench.lock")
    busy = str(tmp_path / "queue.busy")
    events = []

    def queue_side():
        with chiplock.queue_busy(busy):          # block 1 (in flight)
            events.append(("q", "block1", time.time()))
            time.sleep(0.6)
        # yield point: pause while the bench lock is fresh
        chiplock.yield_to_bench(lock, poll_s=0.05)
        with chiplock.queue_busy(busy):          # block 2
            events.append(("q", "block2", time.time()))

    th = threading.Thread(target=queue_side)
    th.start()
    time.sleep(0.2)                              # bench arrives mid-block-1
    with chiplock.bench_lock(lock, busy_path=busy, busy_max_wait_s=30.0,
                             busy_poll_s=0.05):
        events.append(("b", "start", time.time()))
        time.sleep(0.4)                          # the timed window
        events.append(("b", "end", time.time()))
    th.join(timeout=30)
    by = {(s, w): t for s, w, t in events}
    # bench started only after block 1's marker cleared (>=0.6s in)
    assert by[("b", "start")] >= by[("q", "block1")] + 0.55
    # the queue's next block waited for the bench window to finish
    assert by[("q", "block2")] >= by[("b", "end")]


def test_default_busy_wait_exceeds_longest_block():
    """Regression guard for VERDICT r4 item 1b: the bench's busy-marker
    wait must cover the longest real queue block (timeout 10800)."""
    assert chiplock.BUSY_MAX_WAIT_S >= 10800
    assert chiplock.LEASE_WAIT_S >= 10800
