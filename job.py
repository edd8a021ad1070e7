#!/usr/bin/env python
"""spark-submit entry point (BASELINE.json:14 "run via spark-submit
--py-files"): ship the package with --py-files watchman_spark.zip and this
file as the application. See watchman_spark/job.py for subcommands."""

import sys

from watchman_spark.job import main

if __name__ == "__main__":
    sys.exit(main())
