"""Filesystem roots (counterpart of reference gluefactory/settings.py:1-6).

Overridable via environment variables so tests and clusters can relocate them.
"""

import os
from pathlib import Path

root = Path(os.environ.get("GLUEFACTORY_TPU_ROOT", Path(__file__).parent.parent))

DATA_PATH = Path(os.environ.get("GLUEFACTORY_TPU_DATA", root / "data"))
TRAINING_PATH = Path(
    os.environ.get("GLUEFACTORY_TPU_TRAINING", root / "outputs" / "training")
)
EVAL_PATH = Path(os.environ.get("GLUEFACTORY_TPU_EVAL", root / "outputs" / "results"))
