"""Run lock — the reference's PID-mutex, natively.

The reference refuses concurrent runs via a PID file: if the recorded PID is
alive it errors out; if the holder died it warns, removes the stale file and
continues (``run_syncdiff_config.sh:70-93``), with trap-based cleanup on
EXIT/INT/TERM. Here the same semantics are a context manager: O_EXCL
creation makes acquisition atomic (the shell's read-then-write has a TOCTOU
window), liveness comes from ``kill -0``, and release happens in ``__exit__``
(plus optional signal hooks for detached runs).
"""

from __future__ import annotations

import fcntl
import os
import signal
import threading

__all__ = ["LockHeld", "RunLock"]


class LockHeld(RuntimeError):
    """Another live process holds the run lock."""

    def __init__(self, path: str, pid: int) -> None:
        super().__init__(f"already running (PID: {pid}, lock: {path})")
        self.path = path
        self.pid = pid


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists but owned by someone else
    return True


class RunLock:
    """Exclusive run lock with stale-holder cleanup.

    >>> with RunLock("/tmp/compare.lock"):
    ...     run()
    """

    def __init__(self, path: str | os.PathLike[str]) -> None:
        self.path = str(path)
        self._acquired = False

    def acquire(self) -> "RunLock":
        # Two attempts: the second runs only after a stale lock was removed.
        for _ in range(2):
            # Write the pid to a private temp file FIRST, then publish it
            # atomically via link(2): with O_EXCL-create-then-write, a
            # reader could hit the empty-file window between creation and
            # the pid write, read pid 0, conclude "stale", and delete a
            # LIVE holder's lock. The linked file is never observable
            # without its pid.
            # unique per ATTEMPT, not just per process: two threads of one
            # process sharing a pid-named temp would link/unlink each
            # other's file mid-acquire
            tmp = f"{self.path}.{os.getpid()}.{threading.get_ident()}.tmp"
            with open(tmp, "w") as fh:
                fh.write(str(os.getpid()))
            try:
                os.link(tmp, self.path)
            except FileExistsError:
                os.unlink(tmp)
                pid = self._read_holder()
                if pid and _pid_alive(pid):
                    raise LockHeld(self.path, pid)
                # Holder died without cleanup (reference "stale PID file
                # detected, cleaning up and continuing") — remove the
                # stale lock and retry the (exclusive) link above.
                self._steal()
                continue
            os.unlink(tmp)
            self._acquired = True
            return self
        raise LockHeld(self.path, self._read_holder() or -1)

    def _steal(self) -> None:
        """Remove a stale lock — serialized, verified, atomic.

        Steal via RENAME, not unlink: two racers that both read the dead
        pid would otherwise both unlink-and-create — the second unlink
        removes the FIRST racer's brand-new lock and both proceed. rename
        is atomic, exactly one racer wins it; the loser just retries the
        exclusive link in :meth:`acquire`.

        Rename alone still leaves a window: racer B reads a dead holder,
        racer A completes the whole steal AND acquires a live lock, and
        B's later rename then moves A's fresh LIVE lock aside — two
        holders. Two defenses close it:

        1. the steal runs under an ``flock`` on a ``.steal`` sidecar
           (never unlinked — removing a file other processes may hold an
           flock on would hand out a fresh inode and void the exclusion)
           and RE-READS the holder pid inside the guard, via ``open``:
           an ABSENT lock means a guarded racer already stole it, and
           renaming anyway would race the unguarded fast-path ``link`` —
           re-read-0/absent → racer links a live lock → our rename
           displaces it, and the best-effort restore leaves a window a
           second ``link`` lands in (observed: two winners in ~4% of
           8-thread trials). Once ``open`` SUCCEEDS the rename is exact:
           no guarded steal can remove the file (we hold the guard) and
           no ``link`` can replace it (the target exists), so the file
           moved is byte-identical to the one read;
        2. after the rename, the stolen file's pid is verified against
           the re-read (lock contents are immutable once published via
           link). A mismatching LIVE pid means a guard-less participant
           (an older build, a hand-rolled script) won an unguarded steal
           and published in between: best-effort restore the displaced
           lock via ``link`` (tolerating a racer having re-created the
           path) and report the live holder instead of displacing it.
        """
        guard = open(f"{self.path}.steal", "a")
        try:
            fcntl.flock(guard, fcntl.LOCK_EX)
            try:
                with open(self.path) as fh:  # authoritative, under guard
                    content = fh.read()
            except FileNotFoundError:
                return  # another racer already stole it — nothing to do
            try:
                pid = int(content.strip() or "0")
            except ValueError:
                pid = 0  # garbage pid file: steal it
            if pid and _pid_alive(pid):
                raise LockHeld(self.path, pid)
            stale = f"{self.path}.stale.{os.getpid()}.{threading.get_ident()}"
            try:
                os.rename(self.path, stale)
            except FileNotFoundError:
                return  # guard-less participant stole it underneath us
            stolen = self._read_pid(stale)
            if stolen and stolen != pid and _pid_alive(stolen):
                try:
                    os.link(stale, self.path)
                except FileExistsError:
                    # a racer re-created the path between our rename and
                    # this link: the displaced LIVE holder's claim now
                    # exists ONLY in the .stale file — leave it on disk
                    # as recoverable evidence (unlinking it would leave
                    # that holder running with no lock anywhere while
                    # the racer also holds one: two effective holders
                    # with the proof destroyed). Reachable only with a
                    # guard-less participant in the mix.
                    raise LockHeld(self.path, stolen)
                os.unlink(stale)  # restored: stale is now a duplicate link
                raise LockHeld(self.path, stolen)
            os.unlink(stale)
        finally:
            guard.close()  # releases the flock

    def _read_holder(self) -> int:
        return self._read_pid(self.path)

    @staticmethod
    def _read_pid(path: str) -> int:
        try:
            with open(path) as fh:
                return int(fh.read().strip() or "0")
        except (OSError, ValueError):
            return 0

    def release(self) -> None:
        if self._acquired:
            try:
                os.unlink(self.path)
            except FileNotFoundError:
                pass
            self._acquired = False

    def install_signal_cleanup(self) -> None:
        """Release on SIGINT/SIGTERM (the shell's ``trap cleanup INT TERM``) —
        for detached runs, where no interactive KeyboardInterrupt unwinds the
        context manager."""

        def _handler(signum, frame):  # pragma: no cover - signal timing
            self.release()
            signal.signal(signum, signal.SIG_DFL)
            os.kill(os.getpid(), signum)

        try:
            signal.signal(signal.SIGINT, _handler)
            signal.signal(signal.SIGTERM, _handler)
        except ValueError:  # not the main thread (embedded use) — skip traps
            pass

    def __enter__(self) -> "RunLock":
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()
