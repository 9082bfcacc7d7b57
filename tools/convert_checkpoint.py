#!/usr/bin/env python
"""Checkout shim — the real module is ams_tpu.cli.convert
(installed: ams-convert)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ams_tpu.cli.convert import main  # noqa: E402

if __name__ == "__main__":
    main()
