"""spark-submit entry file: ALL engine code arrives via --py-files.

    spark-submit --py-files dist/osm_pbf2json_spark.zip \
        tools/submit_cli.py <path> objects -t 'amenity~cafe'

This file deliberately contains no logic — it must work when the
engine package is only importable from the shipped zip (executors get
the same zip through SparkContext's py-files mechanism).
"""

from osm_pbf2json_spark.cli import main

if __name__ == "__main__":
    main()
