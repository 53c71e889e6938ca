#!/usr/bin/env python
"""Training CLI — ``python train.py --config cfg.yaml``.

Thin wrapper over seghiero_tpu.cli.train_main (same flags as the
reference train.py, plus --resume/--quiet).
"""

import sys

from seghiero_tpu.cli import train_main

if __name__ == "__main__":
    sys.exit(train_main())
