"""``python -m raytpu`` — CLI dispatch (see raytpu/cli/main.py)."""

import sys

from raytpu.cli.main import main

sys.exit(main())
