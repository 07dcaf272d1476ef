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
                # detected, cleaning up and continuing"). Steal via
                # RENAME, not unlink: two racers that both read the dead
                # pid would otherwise both unlink-and-create — the second
                # unlink removes the FIRST racer's brand-new lock and both
                # proceed. rename is atomic, exactly one racer wins it;
                # the loser just retries the (exclusive) link above.
                stale = f"{self.path}.stale.{os.getpid()}.{threading.get_ident()}"
                try:
                    os.rename(self.path, stale)
                except FileNotFoundError:
                    pass  # another racer already stole it
                else:
                    os.unlink(stale)
                continue
            os.unlink(tmp)
            self._acquired = True
            return self
        raise LockHeld(self.path, self._read_holder() or -1)

    def _read_holder(self) -> int:
        try:
            with open(self.path) as fh:
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
