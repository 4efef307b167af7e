"""Per-unit resume records keyed by a settings fingerprint.

The reference's ``--resume`` relies on iohub recording per-(t, c)-unit
completion in a ``.iohub-progress/`` sibling of the store, invalidated when
the settings hash changes (reference: biahub/cli/utils.py:66-76,
biahub/cli/parsing.py:308-324). This is the tensorstore-era equivalent: a
JSON record per position, marking units complete only after their chunk is
durably written.
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path

__all__ = ["ProgressStore"]


class ProgressStore:
    """Completion records for (t, c) work units of one output position."""

    def __init__(self, output_position_path: str | Path, token: str):
        output_position_path = Path(output_position_path)
        # Progress lives next to the plate so deleting the plate removes it too.
        plate_root = output_position_path.parents[2]
        rel = "_".join(output_position_path.parts[-3:])
        self.path = plate_root / ".biahub_tpu_progress" / f"{rel}.json"
        self.token = token
        self._done: set[str] = set()
        self._load()

    @staticmethod
    def _key(t: int, c: int) -> str:
        return f"{t}.{c}"

    def _load(self) -> None:
        if self.path.exists():
            try:
                payload = json.loads(self.path.read_text())
            except json.JSONDecodeError:
                return
            # A changed settings fingerprint invalidates prior records: the
            # data those units wrote would now be different.
            if payload.get("token") == self.token:
                self._done = set(payload.get("done", []))

    def is_done(self, t: int, c: int) -> bool:
        return self._key(t, c) in self._done

    def mark_done(self, t: int, c: int) -> None:
        self._done.add(self._key(t, c))
        self._flush()

    def mark_many_done(self, units: list[tuple[int, int]]) -> None:
        self._done.update(self._key(t, c) for t, c in units)
        self._flush()

    def _flush(self) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        payload = {"token": self.token, "done": sorted(self._done)}
        # Atomic replace so a torn write never corrupts the record.
        fd, tmp = tempfile.mkstemp(dir=self.path.parent, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(payload, f)
            os.replace(tmp, self.path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
