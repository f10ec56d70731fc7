"""Shared provenance for committed benchmark artifacts.

Every JSONL row written under ``benchmarks/results/`` records the git
hash of the code that produced it (round-2 verdict: stale artifacts were
indistinguishable from current ones), so a table in ``docs/performance.md``
can always be traced to the producing commit.
"""

import atexit
import json
import os
import subprocess
import sys
from typing import Optional

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def git_hash() -> Optional[str]:
    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=_REPO, timeout=10,
        ).stdout.strip()
        return out or None
    except Exception:  # noqa: BLE001 — provenance is best-effort
        return None


class Rows:
    """Collect benchmark rows; flush as JSONL at exit when ``path`` set.

    ``emit(**fields)`` appends a row (git hash injected); mutating the
    returned dict before the next emit updates the pending row (used to
    attach recall computed after the timing call).
    """

    def __init__(self, path: Optional[str]):
        self.path = path
        self.rows = []
        self._git = git_hash()
        if path:
            atexit.register(self.flush)

    def emit(self, **fields) -> dict:
        row = dict(fields)
        row["git"] = self._git
        self.rows.append(row)
        return row

    def flush(self) -> None:
        if not self.path or not self.rows:
            return
        with open(self.path, "w") as f:
            for row in self.rows:
                f.write(json.dumps(row) + "\n")
        print(
            f"wrote {len(self.rows)} rows to {self.path}", file=sys.stderr
        )
