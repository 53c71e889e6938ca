#!/usr/bin/env python
"""Inference CLI — ``python infer.py --config cfg.yaml --image img.png``.

Thin wrapper over seghiero_tpu.cli.infer_main (same flags as the
reference infer.py; --image is repeatable for batched inference).
"""

import sys

from seghiero_tpu.cli import infer_main

if __name__ == "__main__":
    sys.exit(infer_main())
