"""Dump .explain('formatted') for the r7-touched query paths into
plans/r07/<name>_<tag>.txt. Run once from the round-6 tree (tag=before)
and once from the final r7 tree (tag=after):

    python tools/explain_r07.py before|after [out_repo_dir]

Covers the paths the optimization round touched: the distributed fused
bool/term plans (driver path compiles no Spark plan — it is one collect),
the scored-postings decode, positional/phrase, synonym/indri, and the
gate-level engine_bm25 path. Uses the sf0.01 gate index.
"""

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAG = sys.argv[1] if len(sys.argv) > 1 else "after"
OUT_REPO = sys.argv[2] if len(sys.argv) > 2 else os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))
)
OUT = os.path.join(OUT_REPO, "plans", "r07")
os.makedirs(OUT, exist_ok=True)

from lucene_rust_spark.entry_helpers import gate_searcher  # noqa: E402
from lucene_rust_spark.oracle.bm25 import bool_query, phrase_query, term_query  # noqa: E402
from lucene_rust_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"


def dump(name: str, df) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(OUT, f"{name}_{TAG}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print("wrote", path)


def main() -> None:
    spark = get_spark(app=f"explain_r07_{TAG}", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    s = gate_searcher(spark, SF)
    # distributed plans (the shapes that run at 100x): driver path off
    s.DRIVER_EXEC_MAX_POSTINGS = 0
    dump("dist_term_fused", s.hits_df(term_query("merge"), 10))
    dump("dist_bool_or_fused", s.hits_df(bool_query(should=["merge", "window"]), 10))
    dump(
        "dist_bool_must_not",
        s.hits_df(bool_query(must=["merge"], must_not=["window"]), 10),
    )
    dump("dist_phrase", s._phrase_hits(phrase_query(["merge", "window"])))
    dump("dist_synonym", s._synonym_hits({"type": "synonym", "terms": ["merge", "window"]}))
    from lucene_rust_spark.search.searcher import IndexSearcher

    si = IndexSearcher(spark, s.index_dir, similarity="indri")
    si.DRIVER_EXEC_MAX_POSTINGS = 0
    dump(
        "dist_indri",
        si._indri_and_hits({"type": "indri_and", "terms": ["merge", "window"]}),
    )
    st = s.term_stats(["merge"])
    dump("scored_postings_term", s._scored_postings(["merge"], st))
    dump("positions_decode", s._positions(["merge"]))
    dump("matches_spans", s.matches_df(phrase_query(["merge", "window"])))
    # forced multi-task shuffle plan (FUSED off) — the wide-query shape
    import lucene_rust_spark.search.searcher as sm

    old = sm.FUSED_MAX_POSTINGS
    sm.FUSED_MAX_POSTINGS = 0
    try:
        dump("dist_bool_or_shuffle", s.hits_df(bool_query(should=["merge", "window"]), 10))
    finally:
        sm.FUSED_MAX_POSTINGS = old
    spark.stop()


if __name__ == "__main__":
    main()
