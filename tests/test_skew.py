"""Skew handling (north_rule: 'handle repo/lang skew via salted
repartitioning'): the build's routing key is a per-DOC hash of
(repo, path, commit) — the salt is the path/commit component, so one
giant repo or language cannot pile onto one segment/DWPT. These tests
prove the balance property on adversarially skewed corpora."""

import numpy as np
import pandas as pd


def _seg_sizes(manifest):
    return np.array([s["max_doc"] for s in manifest["segments"]], dtype=np.int64)


def test_giant_repo_balances_across_segments(spark, tmp_path):
    """90% of docs in ONE repo: per-segment doc counts stay near-uniform
    (the doc-level hash IS the salted repartition — a repo-keyed route
    would put 90% of the corpus in one DWPT)."""
    from lucene_rust_spark.index.build import build_index

    n = 4000
    rows = [
        {
            "repo": "giant/repo" if i % 10 else f"small/r{i}",
            "path": f"src/f{i}.py",
            "commit": f"c{i % 7}",
            "lang": "python",
            "content": f"token_{i % 50} shared merge value {i}",
        }
        for i in range(n)
    ]
    src = spark.createDataFrame(pd.DataFrame(rows))
    out = str(tmp_path / "skew_idx")
    m = build_index(spark, src, out, num_partitions=16)
    sizes = _seg_sizes(m)
    assert len(sizes) == 16 and sizes.sum() == n
    # uniform hash target = n/16 = 250; require every segment within 25%
    assert sizes.max() <= 1.25 * n / 16, sizes.tolist()
    assert sizes.min() >= 0.75 * n / 16, sizes.tolist()


def test_skewed_lang_does_not_skew_shuffle(spark, tmp_path):
    """The synthetic corpus's intentional skew (repo 0 holds ~30% of
    files, one dominant lang) still yields balanced segments AND a
    balanced postings term-range layout (no shuffle partition holds a
    disproportionate share of block rows)."""
    import os

    from pyspark.sql import functions as F

    from lucene_rust_spark.corpus import gen_corpus_spark
    from lucene_rust_spark.index.build import build_index

    src = gen_corpus_spark(spark, 3000, 4)
    top_repo_share = (
        src.groupBy("repo").count().orderBy(F.desc("count")).first()["count"] / 3000
    )
    assert top_repo_share > 0.2  # the corpus IS skewed by construction
    out = str(tmp_path / "skew2_idx")
    m = build_index(spark, src, out, num_partitions=8)
    sizes = _seg_sizes(m)
    assert sizes.max() / max(sizes.min(), 1) < 1.4, sizes.tolist()
    # postings files (term-range shuffle output) are size-balanced too:
    # no file should hold more than ~3x the mean share of block rows
    pf = spark.read.parquet(os.path.join(out, "postings"))
    per_file = (
        pf.groupBy(F.input_file_name().alias("f")).count().toPandas()["count"].to_numpy()
    )
    per_file = per_file[per_file > 0]
    assert per_file.max() <= 3.0 * per_file.mean(), sorted(per_file)[-5:]
