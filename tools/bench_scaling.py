"""Two-parallelism scaling benchmark → BENCH/BASELINE.md.

Sandbox substitute for the north_rule's "N vs 4N executors on a real
cluster": the identical job runs at local[8] and local[32] on the SAME
pre-generated input, each in a fresh JVM (separate subprocess, so no
warm-cache cross-talk). Efficiency = (T_N * N) / (T_4N * 4N).

Usage: python tools/bench_scaling.py [--docs 200000] [--n 8] [--n4 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_worker(cores: int, docs: int, documents: str, query_mult: int, pin: bool = True, max_batch: int = 0) -> dict:
    # tmpfs for shuffle + work dirs: isolates the measurement from disk
    # writeback interference between runs (this box's /tmp is one shared
    # virtio disk; a real cluster has per-node local SSDs)
    os.makedirs("/dev/shm/sparktmp", exist_ok=True)
    os.environ["SPARK_LOCAL_DIRS"] = "/dev/shm/sparktmp"
    work = tempfile.mkdtemp(prefix=f"ts_scale_{cores}_", dir="/dev/shm")
    # Pin the whole process tree (JVM + python workers inherit the
    # affinity mask) to exactly `cores` logical CPUs: unpinned local[N]
    # caps task SLOTS at N but lets GC/shuffle/parquet threads spill
    # onto all 32 host cores, inflating the small-"cluster" baseline —
    # a real N-core executor node has no such free cores. The JVM sizes
    # its GC pool from the affinity mask, so this also keeps GC-thread
    # count faithful to the modeled node size.
    pin_prefix = ["taskset", "-c", f"0-{cores - 1}"] if pin else []
    cmd = pin_prefix + [
        sys.executable,
        os.path.join(os.path.dirname(__file__), "_scaling_worker.py"),
        "--cores", str(cores),
        "--docs", str(docs),
        "--documents", documents,
        "--work", work,
        "--query-mult", str(query_mult),
        "--max-batch", str(max_batch),
    ]
    subprocess.run(["sync"], check=False)
    # hard per-worker timeout + one retry: a py4j socket hiccup can hang
    # the worker forever with an idle JVM (observed); a rep must never
    # wedge the whole protocol
    for attempt in (1, 2):
        try:
            out = subprocess.run(
                cmd, capture_output=True, text=True, check=True, timeout=1200
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            return json.loads(line)
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError, IndexError):
            if attempt == 2:
                raise
            subprocess.run(["pkill", "-9", "-f", "_scaling_worker"], check=False)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=500_000)
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--n4", type=int, default=16)
    p.add_argument("--query-mult", type=int, default=8)
    p.add_argument("--reps", type=int, default=2, help="runs per level; min is kept (noisy-neighbor robust)")
    p.add_argument("--no-pin", action="store_true", help="skip taskset CPU pinning (r1 protocol)")
    p.add_argument("--max-batch", type=int, default=0, help="bounded serve chunks (topk_batched); 0 = one batch")
    args = p.parse_args()

    from theoremsearch_spark.corpus import generate_documents
    from theoremsearch_spark.session import get_spark

    docs_path = os.path.join(tempfile.gettempdir(), f"ts_scale_corpus_{args.docs}")
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        spark = get_spark("scaling_gen", cores=32)
        spark.sparkContext.setLogLevel("ERROR")
        generate_documents(spark, args.docs, partitions=64).write.mode(
            "overwrite"
        ).parquet(docs_path)
        spark.stop()

    # alternate levels, keep the per-level minimum: this sandbox is a
    # shared VM with bursty neighbor steal — min-of-N is the stable
    # estimator of the true cost at each parallelism
    los, his = [], []
    for _ in range(args.reps):
        his.append(run_worker(args.n4, args.docs, docs_path, args.query_mult, pin=not args.no_pin, max_batch=args.max_batch))
        los.append(run_worker(args.n, args.docs, docs_path, args.query_mult, pin=not args.no_pin, max_batch=args.max_batch))

    PHASES = ("build_sec", "prep_sec", "index_sec", "query_sec")

    def best(runs):
        # WHOLE-RUN minimum: the headline numbers all come from one rep,
        # so build_sec always equals prep_sec + index_sec and the
        # published efficiency pairs are real measured runs. The
        # per-phase floor across reps (with its source rep) and every
        # raw wall are recorded alongside for auditability — grafting
        # the floors onto one dict (the old behavior) made the JSON
        # internally inconsistent as evidence.
        out = dict(min(runs, key=lambda r: r["build_sec"] + r["query_sec"]))
        out["raw_reps"] = [{k: r[k] for k in PHASES} for r in runs]
        out["phase_floor"] = {
            k: {
                "sec": min(r[k] for r in runs),
                "rep": min(range(len(runs)), key=lambda i, k=k: runs[i][k]),
            }
            for k in PHASES
        }
        return out

    lo, hi = best(los), best(his)

    ratio = args.n4 / args.n
    eff_build = (lo["build_sec"] * args.n) / (hi["build_sec"] * args.n4)
    eff_query = (lo["query_sec"] * args.n) / (hi["query_sec"] * args.n4)
    result = {
        "docs": args.docs,
        "n_queries": lo["n_queries"],
        "low": lo,
        "high": hi,
        "build": {
            f"docs_per_sec@{args.n}": round(args.docs / lo["build_sec"], 1),
            f"docs_per_sec@{args.n4}": round(args.docs / hi["build_sec"], 1),
            "scaling_efficiency": round(eff_build, 3),
        },
        "query": {
            f"queries_per_sec@{args.n}": round(lo["n_queries"] / lo["query_sec"], 2),
            f"queries_per_sec@{args.n4}": round(hi["n_queries"] / hi["query_sec"], 2),
            "scaling_efficiency": round(eff_query, 3),
        },
    }
    print(json.dumps(result))

    os.makedirs("BENCH", exist_ok=True)
    # raw per-run report; the curated narrative (incl. host-noise
    # attribution) lives in BENCH/BASELINE.md and is maintained by hand
    with open("BENCH/scaling.md", "w") as f:
        f.write(f"""# BENCH — measured engine performance + scaling evidence

Protocol (BASELINE.md / driver two-parallelism rule): identical job at
`local[{args.n}]` and `local[{args.n4}]` (fresh JVM each) on the same
pre-generated {args.docs:,}-doc synthetic corpus (Zipf tokens,
stopword skew, FIXTURES.md §1). Efficiency = (T_N·N)/(T_4N·4N).

## Index build (extract → dense ids → salted posting build, compressed)

| cores | wall s | docs/sec |
|---|---|---|
| {args.n} | {lo['build_sec']} | {args.docs / lo['build_sec']:.1f} |
| {args.n4} | {hi['build_sec']} | {args.docs / hi['build_sec']:.1f} |

**Build scaling efficiency {args.n}→{args.n4} cores: {eff_build:.3f}**
(target ≥ 0.8)

## Batch BM25 query serving ({lo['n_queries']} queries, k=10)

| cores | wall s | queries/sec |
|---|---|---|
| {args.n} | {lo['query_sec']} | {lo['n_queries'] / lo['query_sec']:.2f} |
| {args.n4} | {hi['query_sec']} | {hi['n_queries'] / hi['query_sec']:.2f} |

**Query scaling efficiency {args.n}→{args.n4} cores: {eff_query:.3f}**
(target ≥ 0.8)

Correctness under both runs: top-k rows = {lo['topk_rows']} (k×queries
as expected), rank-identity vs the single-node oracle enforced by
`tests/test_engine.py::test_rank_identity_vs_oracle`.

Raw JSON: see `BENCH/scaling.json`.
""")
    with open("BENCH/scaling.json", "w") as f:
        json.dump(result, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
