"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` builds (or reuses) the REAL inverted index over the
sf0.001 documents table and runs a BM25 top-10 boolean query through the
engine (block decode + float32 kernel + TakeOrderedAndProject).

``queries()`` / ``oracle_sql()``: one entry per implemented operator from
SURVEY.md §2 plus the training-data ops; most have exact DuckDB oracles
(see lucene_rust_spark/gate.py), and the engine_* entries additionally run
the full index+search path with integer-exact oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: engine BM25 top-10 for 'merge OR window' on sf0.001."""
    from pyspark.sql import functions as F

    from lucene_rust_spark.entry_helpers import gate_searcher
    from lucene_rust_spark.oracle.bm25 import bool_query

    s = gate_searcher(spark, "/root/testdata/sf0.001")
    hits = s.search_df(bool_query(should=["merge", "window"]), k=10)
    return s.fetch(hits).select(
        "doc_id", F.round("score", 4).alias("score"), "repo", "path", "lang"
    )


def _engine_term_count(spark, sf_dir):
    from lucene_rust_spark.entry_helpers import count_df, gate_searcher
    from lucene_rust_spark.oracle.bm25 import term_query

    return count_df(spark, gate_searcher(spark, sf_dir).count(term_query("merge")))


def _engine_and_count(spark, sf_dir):
    from lucene_rust_spark.entry_helpers import count_df, gate_searcher
    from lucene_rust_spark.oracle.bm25 import bool_query

    q = bool_query(must=["merge", "window"])
    return count_df(spark, gate_searcher(spark, sf_dir).count(q))


def _engine_not_count(spark, sf_dir):
    from lucene_rust_spark.entry_helpers import count_df, gate_searcher
    from lucene_rust_spark.oracle.bm25 import bool_query

    q = bool_query(must=["merge"], must_not=["window"])
    return count_df(spark, gate_searcher(spark, sf_dir).count(q))


def _engine_msm_count(spark, sf_dir):
    from lucene_rust_spark.entry_helpers import count_df, gate_searcher
    from lucene_rust_spark.oracle.bm25 import bool_query

    q = bool_query(should=["merge", "window", "batch"], min_should_match=2)
    return count_df(spark, gate_searcher(spark, sf_dir).count(q))


def _engine_prefix_count(spark, sf_dir):
    from lucene_rust_spark.entry_helpers import count_df, gate_searcher

    q = {"type": "prefix", "prefix": "st"}
    return count_df(spark, gate_searcher(spark, sf_dir).count(q))


def _engine_fuzzy_count(spark, sf_dir):
    from lucene_rust_spark.entry_helpers import count_df, gate_searcher

    q = {"type": "fuzzy", "term": "merje", "max_edits": 1}
    return count_df(spark, gate_searcher(spark, sf_dir).count(q))


_TOKS_CTE = (
    "WITH tk AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text),"
    " '[^a-z0-9_]+'), x -> x <> '') AS toks FROM documents)"
)

_ENGINE_QUERIES = {
    "engine_prefix_count": (
        _engine_prefix_count,
        f"{_TOKS_CTE} SELECT count(*)::BIGINT AS n_hits FROM tk "
        "WHERE len(list_filter(toks, x -> x LIKE 'st%')) > 0",
    ),
    "engine_fuzzy_count": (
        _engine_fuzzy_count,
        # same expansion semantics: terms within edit distance 1 of 'merje'
        f"{_TOKS_CTE} SELECT count(*)::BIGINT AS n_hits FROM tk "
        "WHERE len(list_filter(toks, x -> levenshtein(x, 'merje') <= 1)) > 0",
    ),
    "engine_term_count": (
        _engine_term_count,
        "WITH tk AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text),"
        " '[^a-z0-9_]+'), x -> x <> '') AS toks FROM documents) "
        "SELECT count(*)::BIGINT AS n_hits FROM tk WHERE list_contains(toks, 'merge')",
    ),
    "engine_and_count": (
        _engine_and_count,
        "WITH tk AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text),"
        " '[^a-z0-9_]+'), x -> x <> '') AS toks FROM documents) "
        "SELECT count(*)::BIGINT AS n_hits FROM tk WHERE list_contains(toks, 'merge')"
        " AND list_contains(toks, 'window')",
    ),
    "engine_not_count": (
        _engine_not_count,
        "WITH tk AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text),"
        " '[^a-z0-9_]+'), x -> x <> '') AS toks FROM documents) "
        "SELECT count(*)::BIGINT AS n_hits FROM tk WHERE list_contains(toks, 'merge')"
        " AND NOT list_contains(toks, 'window')",
    ),
    "engine_msm_count": (
        _engine_msm_count,
        "WITH tk AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text),"
        " '[^a-z0-9_]+'), x -> x <> '') AS toks FROM documents) "
        "SELECT count(*)::BIGINT AS n_hits FROM tk WHERE "
        "(list_contains(toks, 'merge')::INT + list_contains(toks, 'window')::INT"
        " + list_contains(toks, 'batch')::INT) >= 2",
    ),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lucene_rust_spark.gate import GATE

    out = {name: fn for name, (fn, _sql) in GATE.items()}
    out.update({name: fn for name, (fn, _sql) in _ENGINE_QUERIES.items()})
    return out


def oracle_sql() -> dict[str, str]:
    from lucene_rust_spark.gate import GATE

    out = {name: sql for name, (_fn, sql) in GATE.items() if sql is not None}
    out.update({name: sql for name, (_fn, sql) in _ENGINE_QUERIES.items()})
    return out
