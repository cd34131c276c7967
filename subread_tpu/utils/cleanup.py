"""Failure detection: temp/partial-output cleanup + disk-full errors.

Reference behavior being matched:
- the index builder hooks SIGINT/SIGTERM and unlinks its temporary file
  before exiting (`SIGINT_hook`, index-builder.c:996-1007, installed at
  :1256-1257), warning that the partial index must not be used;
- every reference writer checks its write result and, on a short write,
  unlinks the partial artifact and prints a "disk is full" error
  (e.g. the junction table writer, core-junction.c:4345-4352).

Here: a process-wide registry of in-flight output artifacts.  `guard()`
registers a path for the duration of a write; if the process dies from
SIGINT/SIGTERM or any exception escapes, the partial file is removed
(atexit covers normal interpreter teardown with pending artifacts).
ENOSPC surfaces as `DiskFullError` with the reference-style message.
"""

from __future__ import annotations

import atexit
import contextlib
import errno
import os
import shutil
import signal
import sys


class DiskFullError(OSError):
    """Raised when a writer hits ENOSPC; the partial artifact has
    already been removed (reference: "ERROR: disk is full; no junction
    table is created.", core-junction.c:4350)."""


_registry: set[str] = set()
_installed = False
_prev_handlers: dict[int, object] = {}


def _remove(path: str) -> None:
    with contextlib.suppress(OSError):
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        else:
            os.unlink(path)


def _cleanup_all() -> None:
    while _registry:
        _remove(_registry.pop())


def _signal_hook(signum, frame):
    if _registry:
        _cleanup_all()
        print(
            "\nReceived a terminal signal. Temporary/partial output files "
            "were removed. The output was NOT generated successfully.",
            file=sys.stderr,
        )
    # restore + re-raise so the exit status reflects the signal
    prev = _prev_handlers.get(signum)
    if callable(prev):
        prev(signum, frame)
    else:
        signal.signal(signum, signal.SIG_DFL)
        os.kill(os.getpid(), signum)


def install() -> None:
    """Install the atexit + SIGINT/SIGTERM cleanup hooks (idempotent;
    only from the main thread — worker threads skip silently)."""
    global _installed
    if _installed:
        return
    _installed = True
    atexit.register(_cleanup_all)
    for signum in (signal.SIGINT, signal.SIGTERM):
        try:
            _prev_handlers[signum] = signal.signal(signum, _signal_hook)
        except ValueError:  # not the main thread
            pass


def register(path: str) -> None:
    install()
    _registry.add(os.fspath(path))


def unregister(path: str) -> None:
    _registry.discard(os.fspath(path))


@contextlib.contextmanager
def guard(*paths: str, what: str = "output"):
    """Track output artifacts for the duration of a write.

    On clean exit the paths are unregistered (they are now valid).  On
    ENOSPC the partials are removed and `DiskFullError` is raised with
    the reference-style message; on any other exception or a fatal
    signal the partials are removed and the error propagates.
    """
    for p in paths:
        register(p)
    try:
        yield
    except OSError as e:
        for p in paths:
            _remove(p)
            unregister(p)
        if e.errno == errno.ENOSPC:
            raise DiskFullError(
                errno.ENOSPC,
                f"disk is full; no {what} is created (removed partial: "
                f"{', '.join(paths)})",
            ) from e
        raise
    except BaseException:
        for p in paths:
            _remove(p)
            unregister(p)
        raise
    else:
        for p in paths:
            unregister(p)
