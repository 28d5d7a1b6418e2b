#!/usr/bin/env python
"""Drop-in entry point: ``python v2e.py <flags>`` like the reference CLI.

Thin shim over the TPU-native implementation (`v2e_tpu.cli`); all flags are
documented there (`python -m v2e_tpu --help`).
"""
import sys

from v2e_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
