"""spark-submit entry: pure document deletion from a generations root.

Usage:
  spark-submit --py-files theoremsearch_spark.zip jobs/delete_docs.py \
      --root <gens root> (--url URL ... | --urls-file path)

Commits a DELETE-ONLY generation (negative namespace) holding
tombstones for every live doc whose url matches — the un-paired half of
the reference's DELETE WHERE id IN (...) + insert cycle
(/root/reference/ec2/rds/upsert.py:4-27 row deletes). Serving applies
the tombstones with exact N/avgdl/df corrections immediately
(query_topk --gens); compaction physically drops the bodies. Deleting
urls that don't exist (or are already deleted) commits nothing.
Prior-version lookup is bucket-pruned via each generation's url-hash
key index where present.

Prints one JSON line, e.g.:
  {"job": "delete_docs", "generation": -1, "deleted": 120, "wall_sec": 4.2}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True, help="gens root directory")
    p.add_argument("--url", action="append", default=[], help="url to delete (repeatable)")
    p.add_argument("--urls-file", help="text file with one url per line")
    args = p.parse_args(argv)

    urls = list(args.url)
    if args.urls_file:
        with open(args.urls_file) as fh:
            urls.extend(line.strip() for line in fh if line.strip())
    if not urls:
        p.error("no urls given (--url / --urls-file)")

    spark = SparkSession.builder.appName("ts-delete-docs").getOrCreate()
    from theoremsearch_spark.streaming.incremental import delete_documents

    t0 = time.monotonic()
    res = delete_documents(spark, args.root, urls)
    print(
        json.dumps(
            {
                "job": "delete_docs",
                "generation": res["generation"],
                "deleted": res["deleted"],
                "urls_requested": len(urls),
                "wall_sec": round(time.monotonic() - t0, 2),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
