"""Thin spark-submit wrapper — the module lives in the --py-files zip.

spark-submit --py-files dist/teleharvest_spark.zip scripts/run_validation.py \
    --input ... --output ... --run-id ...
"""

import sys

from teleharvest_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
