"""Shared provenance for committed benchmark artifacts.

Every JSONL row written under ``benchmarks/results/`` records the git
hash of the code that produced it (round-2 verdict: stale artifacts were
indistinguishable from current ones), so a table in ``docs/performance.md``
can always be traced to the producing commit.
"""

import atexit
import json
import sys
from typing import Optional

from vq_tpu.cli.common import _git_hash


def git_hash() -> Optional[str]:
    """One shared provenance helper (vq_tpu.cli.common) for CLI and
    benchmark artifacts alike."""
    return _git_hash()


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
