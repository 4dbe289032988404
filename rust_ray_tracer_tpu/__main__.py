"""``python -m rust_ray_tracer_tpu`` — the render CLI (utils/cli.py)."""

import sys

from rust_ray_tracer_tpu.utils.cli import main

sys.exit(main())
