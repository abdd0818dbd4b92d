"""Index manifest — the segments_N analog (core/index/segment_index.rs).

A small JSON document listing segments + global counters, committed with
the same two-phase trick the reference uses for segments_N
(pending_segments_ prefix then rename, core/index/segment_index.rs:14-20):
write manifest.json.pending_<gen>, fsync, atomic rename to manifest.json.
Latest-generation discovery (core/index/segment_index.rs:355-408) becomes
"read manifest.json, trust its generation field" because the rename is
atomic and single-writer.
"""

from __future__ import annotations

import json
import os


MANIFEST_NAME = "manifest.json"
PENDING_PREFIX = "manifest.json.pending_"


def commit_manifest(out_dir: str, manifest: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    pending = os.path.join(out_dir, f"{PENDING_PREFIX}{manifest['generation']}")
    with open(pending, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(pending, os.path.join(out_dir, MANIFEST_NAME))


def read_manifest(out_dir: str) -> dict | None:
    path = os.path.join(out_dir, MANIFEST_NAME)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def check_index(out_dir: str, spark) -> dict:
    """CheckIndex analog (clt/index/mod.rs:12): validate manifest invariants
    against the stored parquet. Returns a dict of checked facts; raises on
    violation."""
    m = read_manifest(out_dir)
    assert m is not None, "no manifest"
    norms = spark.read.parquet(os.path.join(out_dir, "norms"))
    docmap = spark.read.parquet(os.path.join(out_dir, "docmap"))
    postings = spark.read.parquet(os.path.join(out_dir, "postings"))
    n_norms = norms.count()
    n_docs = docmap.count()
    assert n_norms == m["doc_count"], (n_norms, m["doc_count"])
    assert n_docs == m["doc_count"], (n_docs, m["doc_count"])
    assert sum(s["max_doc"] for s in m["segments"]) == m["doc_count"]
    assert all(s["del_count"] == 0 for s in m["segments"])
    from pyspark.sql import functions as F

    agg = postings.agg(
        F.sum("sum_tf").alias("ttf"), F.max("n").alias("max_n"), F.min("n").alias("min_n")
    ).collect()[0]
    assert int(agg["ttf"]) == m["sum_total_term_freq"], (agg["ttf"], m["sum_total_term_freq"])
    assert int(agg["max_n"]) <= 128
    assert int(agg["min_n"]) >= 1
    return {"doc_count": n_docs, "sum_ttf": int(agg["ttf"]), "segments": len(m["segments"])}
