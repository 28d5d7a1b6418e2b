"""``python -m v2e_tpu`` — the v2e conversion CLI."""
import sys

from v2e_tpu.cli import main

sys.exit(main())
