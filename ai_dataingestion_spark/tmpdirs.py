"""Per-process temp-dir management for sink/round-trip operators.

Every sink operator needs a scratch output directory per invocation. Raw
``tempfile.mkdtemp`` leaks one directory per call — a repeated driver sweep
accumulates them unboundedly. All operator scratch dirs therefore live under
ONE per-process root that is removed at interpreter exit."""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def op_tmpdir(prefix: str) -> str:
    """A fresh scratch dir under the process-lifetime root (auto-cleaned)."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="spark_graft_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT)
