"""Live progress monitoring (reference: biahub/cli/monitor.py:91-150).

The reference polls submitit job states and renders an ANSI table; with
on-device batches the "jobs" are futures tracked by the batch executor, so
this module renders the same table over any objects exposing ``done()`` /
``state``-like interfaces, and cancels them on ctrl-C.
"""

from __future__ import annotations

import sys
import time

import click

__all__ = ["monitor_jobs", "JobLike"]


class JobLike:
    """Minimal job facade: wraps a callable/future with a state string."""

    def __init__(self, name: str):
        self.name = name
        self.state = "PENDING"

    def done(self) -> bool:
        return self.state in ("DONE", "FAILED", "CANCELLED")

    def cancel(self) -> None:
        self.state = "CANCELLED"


def monitor_jobs(jobs, names, poll_seconds: float = 1.0) -> None:
    """Render a live table of job states until all complete.

    Ctrl-C cancels every job that supports ``cancel()`` and re-raises,
    matching the reference's behavior of cancelling the fleet and dumping the
    first failure.
    """
    names = [str(n) for n in names] or [f"job-{i}" for i in range(len(jobs))]
    try:
        while True:
            states = []
            for job in jobs:
                state = getattr(job, "state", None)
                if state is None:
                    state = "DONE" if getattr(job, "done", lambda: True)() else "RUNNING"
                states.append(str(state))
            lines = [f"{name:<50} {state}" for name, state in zip(names, states)]
            sys.stdout.write("\x1b[2J\x1b[H" + "\n".join(lines) + "\n")
            sys.stdout.flush()
            if all(s in ("DONE", "COMPLETED", "FAILED", "CANCELLED") for s in states):
                break
            time.sleep(poll_seconds)
    except KeyboardInterrupt:
        click.echo("Cancelling jobs...")
        for job in jobs:
            cancel = getattr(job, "cancel", None)
            if cancel:
                cancel()
        raise
    failed = [n for n, j in zip(names, jobs) if getattr(j, "state", "") == "FAILED"]
    if failed:
        click.echo(f"Failed jobs: {failed}")
