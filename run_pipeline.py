#!/usr/bin/env python3
"""spark-submit entry shim:

    spark-submit --py-files structured_data_entity_extraction_spark.zip run_pipeline.py \
        --input /path/repos_src --output /path/warehouse [--run-id r1]

(spark-submit takes a script path, not -m; this shim forwards to
structured_data_entity_extraction_spark.pipeline.main.)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from structured_data_entity_extraction_spark.pipeline import main

if __name__ == "__main__":
    main()
