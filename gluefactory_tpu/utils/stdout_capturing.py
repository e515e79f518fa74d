"""Tee stdout/stderr to a log file during training.

Counterpart of reference gluefactory/utils/stdout_capturing.py (134 LoC,
Sacred-style fd redirection). Python-level tee is sufficient here since all
our logging flows through Python (no C-level stdout writers to capture).
"""

from __future__ import annotations

import sys
from contextlib import contextmanager
from pathlib import Path


class _Tee:
    def __init__(self, stream, fh):
        self.stream = stream
        self.fh = fh

    def write(self, data):
        self.stream.write(data)
        self.fh.write(data)
        self.fh.flush()

    def flush(self):
        self.stream.flush()
        self.fh.flush()

    def isatty(self):
        return getattr(self.stream, "isatty", lambda: False)()

    def fileno(self):
        return self.stream.fileno()


@contextmanager
def capture_outputs(path: str | Path):
    """Mirror stdout/stderr into `path` for the duration of the context
    (reference usage: train.py:634-637 wraps the rank-0 training loop)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "a") as fh:
        out, err = sys.stdout, sys.stderr
        sys.stdout = _Tee(out, fh)
        sys.stderr = _Tee(err, fh)
        try:
            yield
        finally:
            sys.stdout = out
            sys.stderr = err


__all__ = ["capture_outputs"]
