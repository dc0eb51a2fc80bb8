#!/usr/bin/env python
"""spark-submit driver script for KG construction.

The package ships separately as a ``--py-files`` zip; this file is the
program spark-submit executes::

    python -m zipfile -c /tmp/ontograph_spark.zip ontograph_spark/
    spark-submit --master <cluster> --py-files /tmp/ontograph_spark.zip \
        submit_construct.py --input <table> --output <quads> --buckets 64

See ontograph_spark/pipeline/submit.py for the full CLI.
"""

from ontograph_spark.pipeline.submit import main

if __name__ == "__main__":
    raise SystemExit(main())
