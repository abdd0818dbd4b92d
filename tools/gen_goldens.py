"""Regenerate tests/golden/ from the oracle (the only writer of goldens —
FIXTURES.md §4). Run: python tools/gen_goldens.py"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from lucene_rust_spark.corpus import gen_corpus_pandas
from lucene_rust_spark.oracle.bm25 import build_oracle_index, oracle_search
from lucene_rust_spark.queries import build_query_set

T1_ROWS, T1_PARTS = 2000, 8

GOLDEN = pathlib.Path(__file__).resolve().parents[1] / "tests" / "golden"


def main() -> None:
    df = gen_corpus_pandas(T1_ROWS)
    idx = build_oracle_index(df, T1_PARTS)
    queries = build_query_set(idx)
    GOLDEN.mkdir(parents=True, exist_ok=True)
    with open(GOLDEN / "queries.jsonl", "w") as f:
        for q in queries:
            f.write(json.dumps(q) + "\n")
    with open(GOLDEN / "golden_t1.jsonl", "w") as f:
        for q in queries:
            res = oracle_search(idx, q["query"], q["k"])
            if q.get("search_after_page") == 2 and res:
                anchor = res[-1]
                res = oracle_search(idx, q["query"], q["k"], search_after=(anchor[1], anchor[0]))
            f.write(
                json.dumps(
                    {"id": q["id"], "results": [[d, s] for d, s in res]},
                )
                + "\n"
            )
    print(f"wrote {len(queries)} queries + goldens to {GOLDEN}")


if __name__ == "__main__":
    main()
