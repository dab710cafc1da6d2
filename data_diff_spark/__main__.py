"""python -m data_diff_spark — see cli.py."""

import sys

from data_diff_spark.cli import main

sys.exit(main())
