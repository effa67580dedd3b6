"""Entry point: vacuum a multi-generation index root — physically
delete generation directories superseded by compaction.

Usage:
  python jobs/vacuum_index.py --root <gens root> [--min-age 3600] \
      [--dry-run]

`compact_generations` (jobs/compact_index.py) swaps readers to the
merged generation with one atomic manifest rename and leaves the old
gen_*/ directories on disk; without reclaim, every compaction DOUBLES
the stored bytes of the merged span, so a long-running streamed root
leaks disk forever. This job deletes exactly the directories named in
committed manifests' `replaces` lists (the manifest JSON records are
kept — replaying a compacted-away micro-batch still hits the
raw-manifest idempotency skip) once the superseding manifest is at
least --min-age seconds old, so in-flight readers that planned their
scans before the swap can finish. Reference analog: the reference
physically DELETEs replaced rows in the same transaction as the
re-insert (/root/reference/ec2/parse_arxiv_papers/__main__.py:269-283);
an LSM store defers that deletion to a vacuum.

Driver-side filesystem work only — no SparkSession, no Spark jobs.

Prints one JSON line, e.g.:
  {"job": "vacuum_index", "vacuumed": [0, 1], "kept_young": [],
   "bytes_freed": 123456, "wall_sec": 0.02}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# plain-python entry (no spark-submit --py-files zip): make the package
# importable when invoked as `python jobs/vacuum_index.py`
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True, help="gens root directory")
    p.add_argument(
        "--min-age", type=float, default=0.0,
        help="in-flight-reader grace window (seconds): only delete a "
        "superseded dir when the manifest that replaced it is at least "
        "this old",
    )
    p.add_argument(
        "--dry-run", action="store_true",
        help="run the exact selection (grace window included) but delete "
        "nothing — the preview cannot disagree with a real run",
    )
    args = p.parse_args(argv)

    from theoremsearch_spark.streaming.incremental import vacuum_generations

    t0 = time.monotonic()
    res = vacuum_generations(
        args.root, min_age_seconds=args.min_age, dry_run=args.dry_run
    )
    out = {"job": "vacuum_index", **res,
           "wall_sec": round(time.monotonic() - t0, 2)}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
