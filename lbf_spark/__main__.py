"""``python -m lbf_spark`` → the CLI (see lbf_spark/cli.py)."""

import sys

from lbf_spark.cli import main

sys.exit(main())
