"""spark-submit entrypoint: replay a change stream into a snapshot table.

The cluster-shaped deployment (north_rule): the etl_spark package ships via
``--py-files`` and this script is the application file — it uses the active
SparkSession handed to it by spark-submit instead of building its own master.

    spark-submit --master <cluster-or-local[N]> \
        --py-files dist/etl_spark.zip tools/submit_replay.py \
        --stream <dir> --table <dir> [--mode catchup] [--dedupe auto]
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stream", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--mode", default="incremental",
                    choices=["incremental", "catchup"])
    ap.add_argument("--dedupe", default="maxby",
                    choices=["maxby", "window", "salted", "auto"])
    ap.add_argument("--buckets", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("etl_spark_replay")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    from etl_spark.pipeline import IngestPipeline

    pipe = IngestPipeline(
        spark,
        args.table,
        n_buckets=args.buckets,
        dedupe_strategy=args.dedupe,
    )
    stats = pipe.replay(args.stream, mode=args.mode)
    for st in stats:
        print(json.dumps(st.as_dict()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
