"""Multimodal binary-column operators + incremental (streaming) index
append."""

import numpy as np


def test_media_pipeline(spark):
    from lucene_rust_spark.operators.multimodal import (
        audio_stats,
        gen_media_spark,
        image_features,
        image_resize,
        video_sample_frames,
    )

    media = gen_media_spark(spark, 60, 4).persist()
    feats = image_features(media).toPandas()
    assert len(feats) == 20  # every 3rd row is an image
    for f in feats["feature"]:
        assert len(f) == 16
        assert abs(sum(f) - 1.0) < 1e-5  # normalized histogram

    resized = image_resize(media, 4, 4).toPandas()
    assert (resized["data"].map(len) == 16).all()

    frames = video_sample_frames(media, every=2).toPandas()
    assert (frames["frame_no"] % 2 == 0).all()
    assert (frames["data"].map(len) == 64).all()

    astats = audio_stats(media).toPandas()
    assert len(astats) == 20
    assert (astats["rms"] > 0).all()
    media.unpersist()


def test_media_determinism(spark):
    from lucene_rust_spark.operators.multimodal import gen_media_spark

    a = gen_media_spark(spark, 12, 2).toPandas().sort_values("media_id").reset_index(drop=True)
    b = gen_media_spark(spark, 12, 4).toPandas().sort_values("media_id").reset_index(drop=True)
    assert (a["data"] == b["data"]).all()


def test_incremental_append(spark, tmp_path):
    """Batch 0 built, batches 1-2 appended via the streaming sink; results
    must equal a full rebuild (same scores; docIDs differ by construction,
    so compare (path, score) multisets)."""
    from lucene_rust_spark.corpus import gen_corpus_spark
    from lucene_rust_spark.index.build import build_index
    from lucene_rust_spark.oracle.bm25 import bool_query
    from lucene_rust_spark.search.searcher import IndexSearcher
    from lucene_rust_spark.streaming.incremental import append_batch, stream_append

    full_src = gen_corpus_spark(spark, 600, 4).persist()
    b0 = full_src.filter("row_id < 200").drop("row_id")
    b1 = full_src.filter("row_id >= 200 and row_id < 400").drop("row_id")
    b2 = full_src.filter("row_id >= 400").drop("row_id")

    inc_dir = str(tmp_path / "inc")
    build_index(spark, b0, inc_dir, num_partitions=4)
    # one direct append + one through the Structured Streaming sink
    append_batch(spark, b1, inc_dir, epoch=99, num_partitions=4)  # distinct epoch namespace from the stream's epoch 0
    batch2_dir = str(tmp_path / "b2src")
    b2.write.mode("overwrite").parquet(batch2_dir)
    stream = spark.readStream.schema(b2.schema).parquet(batch2_dir)
    q = stream_append(spark, stream, inc_dir, str(tmp_path / "ckpt"), num_partitions=4)
    q.awaitTermination(120)

    full_dir = str(tmp_path / "full")
    build_index(spark, full_src.drop("row_id"), full_dir, num_partitions=4)

    s_inc = IndexSearcher(spark, inc_dir)
    s_full = IndexSearcher(spark, full_dir)
    assert s_inc.doc_count == s_full.doc_count == 600
    assert s_inc.sum_ttf == s_full.sum_ttf
    assert s_inc.manifest["content_sha256_xor"] == s_full.manifest["content_sha256_xor"]

    for query in [bool_query(should=["token", "value"]), bool_query(must=["index"])]:
        k = 1000  # > doc_count: no tie-boundary truncation, full hit sets compare
        a = s_inc.fetch(s_inc.search_df(query, k)).select("path", "score").collect()
        b = s_full.fetch(s_full.search_df(query, k)).select("path", "score").collect()
        a_set = sorted((r["path"], round(float(np.float32(r["score"])), 6)) for r in a)
        b_set = sorted((r["path"], round(float(np.float32(r["score"])), 6)) for r in b)
        assert a_set == b_set
    full_src.unpersist()
