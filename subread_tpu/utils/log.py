"""Leveled, stage-filtered logging (the reference's sublog layer).

Reference: sublog.c/h — `sublog_printf(stage, level, fmt, ...)` filters
messages by minimum level before writing to stderr (sublog.h:23-41), and
`print_in_box` draws the boxed TUI summaries (core.c:3697-3713).  Here:
one module-level filter, env-overridable (SUBREAD_TPU_LOGLEVEL), plus the
boxed-summary helper used by the CLI front-ends.
"""

from __future__ import annotations

import os
import sys
import time

# levels mirror sublog.h: DEBUG < DETAILS < INFO < WARNING < ERROR < FATAL
DEBUG, DETAILS, INFO, WARNING, ERROR, FATAL = 0, 1, 2, 3, 4, 5
_NAMES = {"debug": DEBUG, "details": DETAILS, "info": INFO,
          "warning": WARNING, "error": ERROR, "fatal": FATAL}

_min_level = _NAMES.get(
    os.environ.get("SUBREAD_TPU_LOGLEVEL", "info").lower(), INFO
)


def set_level(level: int | str) -> None:
    global _min_level
    _min_level = _NAMES[level.lower()] if isinstance(level, str) else level


def log(level: int, msg: str, *args) -> None:
    if level < _min_level:
        return
    if args:
        msg = msg % args
    sys.stderr.write(msg + "\n")
    sys.stderr.flush()


def debug(msg, *args):
    log(DEBUG, msg, *args)


def info(msg, *args):
    log(INFO, msg, *args)


def warning(msg, *args):
    log(WARNING, "WARNING: " + msg, *args)


def error(msg, *args):
    log(ERROR, "ERROR: " + msg, *args)


def print_in_box(lines: list[str], width: int = 75, title: str = "") -> None:
    """Boxed TUI summary (print_in_box, core.c:3697)."""
    if INFO < _min_level:
        return
    top = "//" + ("=" * (width - 4)) + "\\\\"
    if title:
        pad = (width - 4 - len(title) - 2) // 2
        top = "//" + "=" * pad + f" {title} " + "=" * (
            width - 4 - pad - len(title) - 2
        ) + "\\\\"
    sys.stderr.write(top + "\n")
    for ln in lines:
        sys.stderr.write("|| " + ln.ljust(width - 6) + " ||\n")
    sys.stderr.write("\\\\" + "=" * (width - 4) + "//\n")
    sys.stderr.flush()


class PhaseTimer:
    """Wall-clock phase timing (timecost_* fields, core.h:546-549,
    sampled with miltime(), reported by show_summary core.c:344)."""

    def __init__(self):
        self.phases: dict[str, float] = {}

    def __call__(self, name: str):
        return _Phase(self, name)

    def report(self) -> list[str]:
        return [f"{k:<24s} {v:8.2f} s" for k, v in self.phases.items()]


class _Phase:
    def __init__(self, timer: PhaseTimer, name: str):
        self.timer, self.name = timer, name

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.timer.phases[self.name] = (
            self.timer.phases.get(self.name, 0.0) + time.time() - self.t0
        )
