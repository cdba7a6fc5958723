"""``python -m cocrawler_ray`` — see cli.py."""

import sys

from cocrawler_ray.cli import main

sys.exit(main())
