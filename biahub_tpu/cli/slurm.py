"""Blocking wait over job-like objects (reference: biahub/cli/slurm.py:6-25)."""

from __future__ import annotations

import time

import click


def wait_for_jobs_to_finish(jobs, poll_seconds: float = 1.0) -> None:
    """Block until every job reports done; works on futures and job facades."""
    remaining = list(jobs)
    while remaining:
        still = []
        for job in remaining:
            done = getattr(job, "done", None)
            if done is not None and not done():
                still.append(job)
        if len(still) != len(remaining):
            click.echo(f"{len(jobs) - len(still)}/{len(jobs)} jobs finished")
        remaining = still
        if remaining:
            time.sleep(poll_seconds)
