"""Per-unit resume records keyed by a settings fingerprint.

The reference's ``--resume`` relies on iohub recording per-(t, c)-unit
completion in a ``.iohub-progress/`` sibling of the store, invalidated when
the settings hash changes (reference: biahub/cli/utils.py:66-76,
biahub/cli/parsing.py:308-324). This is the tensorstore-era equivalent: a
JSON record per (position, writer process), marking units complete only
after their chunk is durably written.

Multi-host safety: processes stripe (t, c) units WITHIN a position
(runtime/executor.py), so a single shared record file would be a
read-modify-write race — the last flusher clobbers its peers' marks. Each
process therefore owns its own record file (``<pos>.p<process_index>.json``,
single writer, atomic replace) and completion is the UNION of every record
for the position, so a restarted run — with any process count — sees all
finished units.
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
        self._dir = plate_root / ".biahub_tpu_progress"
        self._rel = rel
        import jax

        self.path = self._dir / f"{rel}.p{jax.process_index()}.json"
        self.token = token
        self._done: set[str] = set()
        self._load()

    @staticmethod
    def _key(t: int, c: int) -> str:
        return f"{t}.{c}"

    def _read_record(self, path: Path) -> set[str]:
        try:
            payload = json.loads(path.read_text())
        except (OSError, json.JSONDecodeError):
            return set()
        # A changed settings fingerprint invalidates prior records: the
        # data those units wrote would now be different.
        if payload.get("token") != self.token:
            return set()
        return set(payload.get("done", []))

    def _load(self) -> None:
        # Union over every writer's record (including the pre-per-process
        # legacy file name) so completion survives restarts that change the
        # process count. The glob is anchored at ".p<digits>" — a bare
        # f"{rel}*" would also match a DIFFERENT position whose name extends
        # this one (A_1_0 vs A_1_01) and wrongly skip its unfinished units.
        for path in sorted(self._dir.glob(f"{self._rel}.p*.json")):
            suffix = path.name[len(self._rel) + 2 : -len(".json")]
            if suffix.isdigit():
                self._done |= self._read_record(path)
        legacy = self._dir / f"{self._rel}.json"
        if legacy.exists():
            self._done |= self._read_record(legacy)

    def is_done(self, t: int, c: int) -> bool:
        return self._key(t, c) in self._done

    def mark_done(self, t: int, c: int) -> None:
        self._done.add(self._key(t, c))
        self._flush()

    def mark_many_done(self, units: list[tuple[int, int]]) -> None:
        self._done.update(self._key(t, c) for t, c in units)
        self._flush()

    def _flush(self) -> None:
        self._dir.mkdir(parents=True, exist_ok=True)
        payload = {"token": self.token, "done": sorted(self._done)}
        # Atomic replace so a torn write never corrupts the record. This file
        # has a single writer (this process); peers write their own files.
        fd, tmp = tempfile.mkstemp(dir=self._dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(payload, f)
            os.replace(tmp, self.path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
