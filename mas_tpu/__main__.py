"""``python -m mas_tpu`` — alias for ``python -m mas_tpu.cli``.

The ``__name__`` guard matters: preprocess mode spawns multiprocessing
workers, and under spawn/forkserver start methods each worker re-imports
the main module — an unguarded ``run()`` would re-execute the CLI in
every worker.
"""

import sys

from .cli import run

if __name__ == "__main__":
    sys.exit(run())
