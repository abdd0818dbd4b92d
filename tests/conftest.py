import json
import pathlib

import pytest

T1_ROWS, T1_PARTS = 2000, 8
GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def spark():
    from lucene_rust_spark.session import get_spark

    s = get_spark(app="tests", cores=8, shuffle_partitions=16, driver_memory="8g")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def t1_pandas():
    from lucene_rust_spark.corpus import gen_corpus_pandas

    return gen_corpus_pandas(T1_ROWS)


@pytest.fixture(scope="session")
def oracle_idx(t1_pandas):
    from lucene_rust_spark.oracle.bm25 import build_oracle_index

    return build_oracle_index(t1_pandas, T1_PARTS)


@pytest.fixture(scope="session")
def t1_index(spark, tmp_path_factory):
    """Built t1 index (the golden fixture index, FIXTURES.md §6)."""
    from lucene_rust_spark.corpus import gen_corpus_spark
    from lucene_rust_spark.index.build import build_index

    out = str(tmp_path_factory.mktemp("index") / "t1")
    src = gen_corpus_spark(spark, T1_ROWS, T1_PARTS)
    manifest = build_index(spark, src, out, num_partitions=T1_PARTS)
    return out, manifest


@pytest.fixture(scope="session")
def searcher(spark, t1_index):
    from lucene_rust_spark.search.searcher import IndexSearcher

    out, _ = t1_index
    return IndexSearcher(spark, out, cache=True)


@pytest.fixture(scope="session")
def golden_queries():
    with open(GOLDEN_DIR / "queries.jsonl") as f:
        return [json.loads(line) for line in f]


@pytest.fixture(scope="session")
def golden_results():
    with open(GOLDEN_DIR / "golden_t1.jsonl") as f:
        return {r["id"]: r["results"] for (r,) in ((json.loads(line),) for line in f)}
