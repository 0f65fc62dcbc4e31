"""``python -m mas_tpu`` — alias for ``python -m mas_tpu.cli``."""

import sys

from .cli import run

sys.exit(run())
