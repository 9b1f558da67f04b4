"""Cooperative single-chip arbitration between the benchmark and the
background training/probe queue.

The axon relay exposes ONE physical TPU; two processes timing or training
concurrently skew each other (and long concurrent runs have stalled the
relay outright — PERF.md round-3 "stalled mid-run on the relay").  The
driver's end-of-round ``bench.py`` must see an idle chip, so:

* ``bench_lock()`` — context manager used by bench.py: touches a lock file
  for the duration of the timed run.
* ``yield_to_bench()`` — called by queue scripts between step blocks /
  model rows: sleeps while a FRESH lock exists (stale locks — crashed
  bench — are ignored after ``stale_s``).
* ``chip_lease()`` — mandatory single-writer lease every long-running TPU
  client takes before creating the backend, so two trainers can never
  attach to the relay concurrently (the round-4 wedge class).

Purely advisory (no kernel locking): both sides poll a timestamped file,
which is all the durability /tmp offers on this machine anyway.
"""
import glob as _glob
import itertools
import os
import threading
import time

LOCK_PATH = "/tmp/denet_bench.lock"
BUSY_PATH = "/tmp/denet_queue.busy"
LEASE_PATH = "/tmp/denet_chip.lease"
STALE_S = 20 * 60
MAX_WAIT_S = 30 * 60
KEEPALIVE_S = 60.0
BUSY_STALE_S = 2 * 60
# A bench arriving mid-block waits for the block, not a fixed slice of it:
# round 4's headline was timed against a live queue block because this was
# 10 min while blocks run up to `timeout 10800` (VERDICT r4 item 1b).  The
# bound now exceeds the longest real block; it only engages while a FRESH
# marker with a LIVE holder exists, so a crashed block never pins the bench.
BUSY_MAX_WAIT_S = float(os.environ.get("DENET_TPU_BENCH_BUSY_WAIT_S",
                                       11100.0))
LEASE_WAIT_S = float(os.environ.get("DENET_TPU_LEASE_WAIT_S", 11100.0))


_marker_seq = itertools.count()


class _marker:
    """Touch a marker file for a scope, mtime-refreshed by a daemon thread
    (so holders longer than the staleness window are not misread as
    crashed), removed on exit.

    Each holder writes its OWN file (``<path>.<pid>.<seq>``) so overlapping
    holders — two queue blocks, or an accidental concurrent bench — cannot
    clobber each other's marker on entry or delete it on exit (a shared
    file let holder A's exit void holder B's still-active marker, reopening
    exactly the race the arbitration closes).  Readers treat the youngest
    live file matching ``<path>*`` as THE marker (``lock_age``)."""

    def __init__(self, path, keepalive_s=KEEPALIVE_S):
        self.base = path
        self.path = "%s.%d.%d" % (path, os.getpid(), next(_marker_seq))
        self.keepalive_s = keepalive_s
        self._stop = threading.Event()
        self._thread = None

    def _keepalive(self):
        while not self._stop.wait(self.keepalive_s):
            try:
                os.utime(self.path, None)
            except OSError:
                pass

    def __enter__(self):
        with open(self.path, "w") as f:
            f.write("%d %f" % (os.getpid(), time.time()))
        self._thread = threading.Thread(target=self._keepalive, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        try:
            os.remove(self.path)
        except OSError:
            pass
        return False


class queue_busy(_marker):
    """Mark one uninterruptible queue block (a bench_variants row, an eval
    batch, a timed profile) so an arriving bench waits for it to finish
    instead of timing against a busy chip (ADVICE round 3, item 4).

    MUST NOT span a yield_to_bench() call — the marker is for the work
    BETWEEN yield points, else bench and queue wait on each other (both
    waits are bounded, but the windows then overlap anyway).
    """

    def __init__(self, path=BUSY_PATH, keepalive_s=30.0):
        super().__init__(path, keepalive_s)


class bench_lock(_marker):
    """Hold the chip for a timed benchmark window.

    On entry, first waits (bounded by BUSY_MAX_WAIT_S) for any FRESH
    queue-busy marker to clear, so a benchmark launched mid-row of a
    background queue does not time against a busy chip; then takes the
    lock the queue's yield_to_bench() polls.  A daemon keepalive thread
    refreshes the lock's mtime every KEEPALIVE_S so benches longer than
    STALE_S (plausible: cold compiles + the 200s link transition + many
    timed windows) are not misread as crashed locks by the queue's
    staleness check (ADVICE round 3).  A genuinely crashed bench stops
    refreshing, so staleness detection still works.
    """

    def __init__(self, path=LOCK_PATH, log=None, busy_path=BUSY_PATH,
                 busy_max_wait_s=BUSY_MAX_WAIT_S, busy_stale_s=BUSY_STALE_S,
                 busy_poll_s=5.0):
        super().__init__(path)
        self._log = log
        self._busy_path = busy_path
        self._busy_max_wait_s = busy_max_wait_s
        self._busy_stale_s = busy_stale_s
        self._busy_poll_s = busy_poll_s

    def __enter__(self):
        # Take the lock FIRST, then wait for any in-flight busy block to
        # clear.  Lock-first closes the handover race (busy clears -> the
        # queue's next yield sees no lock yet -> its next block starts
        # under the timed window) and the starvation case (back-to-back
        # queue blocks keeping the busy marker permanently fresh): once
        # the lock exists, every yield point pauses the queue, so the
        # bench waits out at most the ONE block already running.  Blocks
        # never span a yield (queue_busy docstring), so no deadlock.
        ret = super().__enter__()
        waited = 0.0
        while waited < self._busy_max_wait_s:
            age = lock_age(self._busy_path)
            if age is None or age > self._busy_stale_s:
                break
            if self._log is not None and waited == 0.0:
                self._log("bench: queue block in flight (busy marker age "
                          "%.0fs), waiting for it to finish" % age)
            time.sleep(self._busy_poll_s)
            waited += self._busy_poll_s
        return ret


class ChipBusyError(RuntimeError):
    """The chip lease is held by another live process and the wait budget
    is exhausted — refuse loudly instead of attaching a second TPU client
    to the relay (the round-4 wedge class: a second trainer briefly
    attaching and being killed left the first blocked on a dead remote
    call forever, queue_r9.sh header)."""


class chip_lease:
    """Mandatory advisory single-writer lease for long-running TPU clients
    (trainers, evals, probes) — VERDICT r4 item 6.

    Exactly one live process may hold ``LEASE_PATH`` at a time, enforced
    with O_EXCL creation of a single pidfile (per-holder suffix files, as
    _marker uses, cannot give mutual exclusion).  A second acquirer waits
    up to ``wait_s`` (queueing behind the holder, the normal case for
    serialized queue scripts whose predecessor overruns), then raises
    ChipBusyError rather than attaching concurrently.  Crashed holders
    (SIGKILL — __exit__ never ran) are reaped via the dead-pid check the
    other markers already use.  Re-entrant within a process: if we already
    hold it, entering again is a no-op that leaves ownership untouched.

    The lease is about QUEUE-CLASS mutual exclusion, not bench priority:
    acquisition first waits out any fresh bench lock (never spawn a TPU
    client while a timed window runs), and holders still poll
    yield_to_bench() at their usual points while running.  bench.py does
    NOT take the lease — its claim is bench_lock, which lease holders
    pause for; requiring the lease there would deadlock bench against a
    paused-but-alive holder.

    Disabled (no-op) when the process is forced onto CPU
    (JAX_PLATFORMS=cpu — the test-suite smoke runs never touch the relay)
    or DENET_TPU_CHIP_LEASE=0; tests pass ``enabled=True`` explicitly.
    """

    def __init__(self, name="", path=LEASE_PATH, wait_s=LEASE_WAIT_S,
                 poll_s=5.0, keepalive_s=KEEPALIVE_S, log=None,
                 bench_path=LOCK_PATH, enabled=None):
        if enabled is None:
            enabled = (os.environ.get("DENET_TPU_CHIP_LEASE", "1") != "0"
                       and not os.environ.get("JAX_PLATFORMS",
                                              "").startswith("cpu"))
        self.name = name
        self.path = path
        self.wait_s = wait_s
        self.poll_s = poll_s
        self.keepalive_s = keepalive_s
        self._log = log or (lambda m: None)
        self._bench_path = bench_path
        self._enabled = enabled
        self._owned = False
        self._stop = threading.Event()
        self._thread = None

    def _holder_pid(self):
        try:
            with open(self.path) as f:
                return int(f.read().split()[0])
        except (OSError, ValueError, IndexError):
            return None

    def _keepalive(self):
        while not self._stop.wait(self.keepalive_s):
            try:
                os.utime(self.path, None)
            except OSError:
                pass

    def __enter__(self):
        if not self._enabled:
            return self
        # never attach a new TPU client while a bench window is live
        yield_to_bench(self._bench_path, log=self._log)
        waited, warned = 0.0, False
        while True:
            try:
                fd = os.open(self.path,
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
            except FileExistsError:
                if self._holder_pid() == os.getpid():
                    return self            # re-entrant: already ours
                if _one_lock_age(self.path) is None:
                    continue               # dead holder reaped: retry now
                if waited >= self.wait_s:
                    raise ChipBusyError(
                        "chip lease %s held by live pid %s after %.0fs"
                        % (self.path, self._holder_pid(), waited))
                if not warned:
                    self._log("chip lease held by pid %s, queueing (%s)"
                              % (self._holder_pid(), self.name))
                    warned = True
                time.sleep(self.poll_s)
                waited += self.poll_s
                continue
            with os.fdopen(fd, "w") as f:
                f.write("%d %f %s" % (os.getpid(), time.time(), self.name))
            self._owned = True
            self._stop.clear()
            self._thread = threading.Thread(target=self._keepalive,
                                            daemon=True)
            self._thread.start()
            return self

    def __exit__(self, *exc):
        if self._owned:
            self._stop.set()
            if self._thread is not None:
                self._thread.join(timeout=2.0)
            try:
                os.remove(self.path)
            except OSError:
                pass
            self._owned = False
        return False


def _one_lock_age(path):
    """Age of one marker file, or None if absent or its holder is dead.

    Lock/marker files record "pid time"; a killed holder (timeout sends
    SIGKILL after the grace period — __exit__ never runs) leaves the file
    behind, which froze the queue for the full staleness window twice in
    round 4.  A dead pid means the lock is void NOW, not in stale_s."""
    try:
        age = time.time() - os.path.getmtime(path)
    except OSError:
        return None
    try:
        with open(path) as f:
            pid = int(f.read().split()[0])
    except (OSError, ValueError, IndexError):
        return age                         # unreadable: age heuristic only
    try:
        os.kill(pid, 0)                    # signal 0: existence check
    except ProcessLookupError:
        try:
            os.remove(path)                # dead holder: reap the file
        except OSError:
            pass
        return None                        # holder is dead: lock is void
    except OSError:
        pass                               # e.g. EPERM: alive, not ours
    return age


def lock_age(path=LOCK_PATH):
    """Age of the YOUNGEST live marker for ``path`` in seconds, or None if
    no live holder exists.  Holders write per-holder files ``<path>.*``
    (see _marker); the legacy shared-file name is also honored so stale
    files from older runs keep working."""
    ages = [a for a in (_one_lock_age(p)
                        for p in [path] + sorted(_glob.glob(path + ".*")))
            if a is not None]
    return min(ages) if ages else None


def yield_to_bench(path=LOCK_PATH, stale_s=STALE_S, max_wait_s=MAX_WAIT_S,
                   poll_s=5.0, log=None, on_poll=None):
    """Block while a fresh bench lock exists.  Returns the seconds waited.

    ``on_poll`` (if given) is called once per poll iteration — a pause here
    is legitimate idleness, so callers with a stall watchdog pass its beat
    to keep a long bench window from being mistaken for a relay wedge."""
    waited = 0.0
    while waited < max_wait_s:
        age = lock_age(path)
        if age is None or age > stale_s:
            return waited
        if log is not None and waited == 0.0:
            log("chip yield: bench lock present (age %.0fs), pausing" % age)
        if on_poll is not None:
            on_poll()
        time.sleep(poll_s)
        waited += poll_s
    return waited
