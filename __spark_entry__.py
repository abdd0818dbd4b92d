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


_TOKS_CTE = (
    "WITH tk AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text),"
    " '[^a-z0-9_]+'), x -> x <> '') AS toks FROM documents)"
)

_POS_CTE = (
    f"{_TOKS_CTE}, pos AS (SELECT doc_id, unnest(toks) AS term,"
    " unnest(generate_series(1, len(toks))) AS pos FROM tk)"
)


def _engine_bool_counts(spark, sf_dir):
    """Eight query operators through the engine's count path (TermQuery,
    Boolean MUST / MUST_NOT / minimum-should-match, Prefix, Fuzzy,
    Wildcard, TermRange) consolidated into ONE gate row so every operator
    keeps a per-round driver correctness signal within the evaluated gate
    budget."""
    from lucene_rust_spark.entry_helpers import gate_searcher
    from lucene_rust_spark.oracle.bm25 import bool_query, term_query

    s = gate_searcher(spark, sf_dir)
    row = (
        int(s.count(term_query("merge"))),
        int(s.count(bool_query(must=["merge", "window"]))),
        int(s.count(bool_query(must=["merge"], must_not=["window"]))),
        int(
            s.count(
                bool_query(should=["merge", "window", "batch"], min_should_match=2)
            )
        ),
        int(s.count({"type": "prefix", "prefix": "st"})),
        int(s.count({"type": "fuzzy", "term": "merje", "max_edits": 1})),
        int(s.count({"type": "wildcard", "pattern": "mer*"})),
        int(s.count({"type": "range", "lo": "m", "hi": "s"})),
    )
    return spark.createDataFrame(
        [row],
        "n_term long, n_and long, n_not long, n_msm long, n_prefix long,"
        " n_fuzzy long, n_wildcard long, n_range long",
    )


SQL_ENGINE_BOOL_COUNTS = f"""
{_TOKS_CTE}
SELECT
 (SELECT count(*) FROM tk WHERE list_contains(toks, 'merge'))::BIGINT AS n_term,
 (SELECT count(*) FROM tk WHERE list_contains(toks, 'merge')
   AND list_contains(toks, 'window'))::BIGINT AS n_and,
 (SELECT count(*) FROM tk WHERE list_contains(toks, 'merge')
   AND NOT list_contains(toks, 'window'))::BIGINT AS n_not,
 (SELECT count(*) FROM tk WHERE
   (list_contains(toks, 'merge')::INT + list_contains(toks, 'window')::INT
    + list_contains(toks, 'batch')::INT) >= 2)::BIGINT AS n_msm,
 (SELECT count(*) FROM tk
   WHERE len(list_filter(toks, x -> x LIKE 'st%')) > 0)::BIGINT AS n_prefix,
 (SELECT count(*) FROM tk
   WHERE len(list_filter(toks, x -> levenshtein(x, 'merje') <= 1)) > 0)::BIGINT AS n_fuzzy,
 (SELECT count(*) FROM tk
   WHERE len(list_filter(toks, x -> x LIKE 'mer%')) > 0)::BIGINT AS n_wildcard,
 (SELECT count(*) FROM tk
   WHERE len(list_filter(toks, x -> x >= 'm' AND x < 's')) > 0)::BIGINT AS n_range
"""


def _engine_bm25_scores(spark, sf_dir):
    """Every posting of 'merge' straight from the INDEX (FOR-block decode +
    stored norm byte + terms-dict df), scored in double precision so the
    DuckDB oracle (which recomputes tf/dlq from raw text) must agree on
    every value — this validates postings tf, SmallFloat quantization,
    doc_freq and sum_ttf/avgdl, not a DataFrame re-derivation."""
    import math

    from pyspark.sql import functions as F

    from lucene_rust_spark.entry_helpers import doc_id_from_path, gate_searcher
    from lucene_rust_spark.index.build import dl_decode_sql

    s = gate_searcher(spark, sf_dir)
    st = s.term_stats(["merge"])
    if "merge" not in st:
        return spark.createDataFrame([], "doc_id long, tf long, dlq long, score double")
    df_ = st["merge"]["doc_freq"]
    idf = math.log(1.0 + (s.doc_count - df_ + 0.5) / (df_ + 0.5))
    avgdl = s.sum_ttf / s.doc_count
    p = doc_id_from_path(s.fetch(s.term_postings("merge"))).select(
        F.col("orig_doc_id").alias("doc_id"),
        F.col("tf").cast("long").alias("tf"),
        F.col("dlq").cast("long").alias("dlq"),
        F.expr(dl_decode_sql("dlq")).alias("dlv"),
    )
    tfn = F.col("tf") / (
        F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dlv") / F.lit(float(avgdl)))
    )
    return p.select(
        "doc_id", "tf", "dlq", F.round(F.lit(float(idf)) * tfn, 4).alias("score")
    )


_N_FREE = 24  # kernels.NUM_FREE_VALUES (SmallFloat intToByte4 free range)

SQL_ENGINE_BM25_SCORES = f"""
{_TOKS_CTE},
dl AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM tk),
st AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl FROM dl),
fl AS (SELECT tk.doc_id, u.term, count(*)::BIGINT AS tf
       FROM tk, unnest(toks) AS u(term) GROUP BY tk.doc_id, u.term),
m AS (SELECT fl.doc_id, fl.tf, dl.dl FROM fl JOIN dl USING (doc_id)
      WHERE fl.term = 'merge'),
q AS (SELECT m.*, (SELECT count(*) FROM m)::BIGINT AS df, st.n_docs, st.sum_dl
      FROM m CROSS JOIN st),
enc AS (SELECT *,
  (CASE WHEN dl < {_N_FREE} THEN dl
   ELSE {_N_FREE} + (CASE WHEN length(bin(dl - {_N_FREE})) < 4 OR dl - {_N_FREE} = 0
                     THEN dl - {_N_FREE}
                     ELSE ((((dl - {_N_FREE}) >> (length(bin(dl - {_N_FREE})) - 4)) & 7)
                          | ((length(bin(dl - {_N_FREE})) - 4 + 1) << 3)) END)
   END) AS dlq FROM q),
dec AS (SELECT *,
  (CASE WHEN dlq < {_N_FREE} THEN dlq
   ELSE {_N_FREE} + (CASE WHEN dlq - {_N_FREE} < 8 THEN (dlq - {_N_FREE}) & 15
                     ELSE (((dlq - {_N_FREE}) & 7) | 8) << (((dlq - {_N_FREE}) >> 3) - 1) END)
   END) AS dlv FROM enc)
SELECT doc_id, tf::BIGINT AS tf, dlq::BIGINT AS dlq,
  round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        * (tf / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dlv / (sum_dl::DOUBLE / n_docs)))), 4) AS score
FROM dec
"""


def _engine_synonym_scores(spark, sf_dir):
    """SynonymQuery blended stats straight from the INDEX: freq = sum of
    per-term tfs, df = max of the terms' doc_freqs (Lucene SynonymQuery),
    scored in double so DuckDB must agree value-for-value."""
    import math

    from pyspark.sql import functions as F

    from lucene_rust_spark.entry_helpers import doc_id_from_path, gate_searcher
    from lucene_rust_spark.index.build import dl_decode_sql

    s = gate_searcher(spark, sf_dir)
    st = s.term_stats(["merge", "window"])
    terms = [t for t in ("merge", "window") if t in st]
    if not terms:
        return spark.createDataFrame([], "doc_id long, tf long, score double")
    df_ = max(st[t]["doc_freq"] for t in terms)
    idf = math.log(1.0 + (s.doc_count - df_ + 0.5) / (df_ + 0.5))
    avgdl = s.sum_ttf / s.doc_count
    freqs = (
        s._postings_freqs(terms)
        .groupBy("doc_id")
        .agg(F.sum("tf").cast("long").alias("tf"), F.max("dlq").alias("dlq"))
    )
    p = doc_id_from_path(s.fetch(freqs)).select(
        F.col("orig_doc_id").alias("doc_id"),
        F.col("tf"),
        F.expr(dl_decode_sql("dlq")).alias("dlv"),
    )
    tfn = F.col("tf") / (
        F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dlv") / F.lit(float(avgdl)))
    )
    return p.select("doc_id", "tf", F.round(F.lit(float(idf)) * tfn, 4).alias("score"))


SQL_ENGINE_SYNONYM_SCORES = f"""
{_TOKS_CTE},
dl AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM tk),
st AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl FROM dl),
fl AS (SELECT tk.doc_id, u.term, count(*)::BIGINT AS tf
       FROM tk, unnest(toks) AS u(term) GROUP BY tk.doc_id, u.term),
m AS (SELECT fl.doc_id, sum(fl.tf)::BIGINT AS tf, max(dl.dl) AS dl
      FROM fl JOIN dl USING (doc_id)
      WHERE fl.term IN ('merge', 'window') GROUP BY fl.doc_id),
dfs AS (SELECT max(c)::BIGINT AS df FROM
        (SELECT term, count(*)::BIGINT AS c FROM fl
         WHERE term IN ('merge', 'window') GROUP BY term)),
q AS (SELECT m.*, dfs.df, st.n_docs, st.sum_dl FROM m CROSS JOIN dfs CROSS JOIN st),
enc AS (SELECT *,
  (CASE WHEN dl < {_N_FREE} THEN dl
   ELSE {_N_FREE} + (CASE WHEN length(bin(dl - {_N_FREE})) < 4 OR dl - {_N_FREE} = 0
                     THEN dl - {_N_FREE}
                     ELSE ((((dl - {_N_FREE}) >> (length(bin(dl - {_N_FREE})) - 4)) & 7)
                          | ((length(bin(dl - {_N_FREE})) - 4 + 1) << 3)) END)
   END) AS dlq FROM q),
dec AS (SELECT *,
  (CASE WHEN dlq < {_N_FREE} THEN dlq
   ELSE {_N_FREE} + (CASE WHEN dlq - {_N_FREE} < 8 THEN (dlq - {_N_FREE}) & 15
                     ELSE (((dlq - {_N_FREE}) & 7) | 8) << (((dlq - {_N_FREE}) >> 3) - 1) END)
   END) AS dlv FROM enc)
SELECT doc_id, tf,
  round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        * (tf / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dlv / (sum_dl::DOUBLE / n_docs)))), 4) AS score
FROM dec
"""


def _engine_blended_scores(spark, sf_dir):
    """BlendedTermQuery (clt/search/mod.rs:3): per-doc dismax(tie=0.01) of
    boost_t * bm25(tf_t, dl, BLENDED df = max over terms), with unequal
    boosts (merge x2.0, window x0.5) — tf/dlq straight from the INDEX,
    arithmetic in double so DuckDB must agree value-for-value."""
    import math

    from pyspark.sql import functions as F

    from lucene_rust_spark.entry_helpers import doc_id_from_path, gate_searcher
    from lucene_rust_spark.index.build import dl_decode_sql

    s = gate_searcher(spark, sf_dir)
    boosts = {"merge": 2.0, "window": 0.5}
    st = s.term_stats(list(boosts))
    terms = [t for t in sorted(boosts) if t in st]
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    df_ = max(st[t]["doc_freq"] for t in terms)
    idf = math.log(1.0 + (s.doc_count - df_ + 0.5) / (df_ + 0.5))
    avgdl = s.sum_ttf / s.doc_count
    parts = None
    for t in terms:
        p = s.term_postings(t).select(
            "doc_id", F.lit(t).alias("term"), "tf", "dlq"
        )
        parts = p if parts is None else parts.unionByName(p)
    boost_map = F.create_map(
        *[x for t in terms for x in (F.lit(t), F.lit(float(boosts[t])))]
    )
    dlv = F.expr(dl_decode_sql("dlq"))
    tfn = F.col("tf") / (
        F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * dlv / F.lit(float(avgdl)))
    )
    scored = parts.select(
        "doc_id", (boost_map[F.col("term")] * F.lit(float(idf)) * tfn).alias("s")
    )
    agg = scored.groupBy("doc_id").agg(
        F.max("s").alias("mx"), F.sum("s").alias("sm")
    )
    out = agg.select(
        "doc_id",
        F.round(F.col("mx") + 0.01 * (F.col("sm") - F.col("mx")), 4).alias("score"),
    )
    return doc_id_from_path(s.fetch(out)).select(
        F.col("orig_doc_id").alias("doc_id"), "score"
    )


SQL_ENGINE_BLENDED_SCORES = f"""
{_TOKS_CTE},
dl AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM tk),
st AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl FROM dl),
fl AS (SELECT tk.doc_id, u.term, count(*)::BIGINT AS tf
       FROM tk, unnest(toks) AS u(term) GROUP BY tk.doc_id, u.term),
m AS (SELECT fl.doc_id, fl.term, fl.tf, dl.dl,
             CASE fl.term WHEN 'merge' THEN 2.0 ELSE 0.5 END AS boost
      FROM fl JOIN dl USING (doc_id) WHERE fl.term IN ('merge', 'window')),
dfs AS (SELECT max(c)::BIGINT AS df FROM
        (SELECT term, count(*)::BIGINT AS c FROM fl
         WHERE term IN ('merge', 'window') GROUP BY term)),
q AS (SELECT m.*, dfs.df, st.n_docs, st.sum_dl FROM m CROSS JOIN dfs CROSS JOIN st),
enc AS (SELECT *,
  (CASE WHEN dl < {_N_FREE} THEN dl
   ELSE {_N_FREE} + (CASE WHEN length(bin(dl - {_N_FREE})) < 4 OR dl - {_N_FREE} = 0
                     THEN dl - {_N_FREE}
                     ELSE ((((dl - {_N_FREE}) >> (length(bin(dl - {_N_FREE})) - 4)) & 7)
                          | ((length(bin(dl - {_N_FREE})) - 4 + 1) << 3)) END)
   END) AS dlq FROM q),
dec AS (SELECT *,
  (CASE WHEN dlq < {_N_FREE} THEN dlq
   ELSE {_N_FREE} + (CASE WHEN dlq - {_N_FREE} < 8 THEN (dlq - {_N_FREE}) & 15
                     ELSE (((dlq - {_N_FREE}) & 7) | 8) << (((dlq - {_N_FREE}) >> 3) - 1) END)
   END) AS dlv FROM enc),
sc AS (SELECT doc_id,
  boost * ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        * (tf / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dlv / (sum_dl::DOUBLE / n_docs)))) AS s
  FROM dec)
SELECT doc_id, round(max(s) + 0.01 * (sum(s) - max(s)), 4) AS score
FROM sc GROUP BY doc_id
"""


def _engine_indri_and_scores(spark, sf_dir):
    """Indri smoothed AND (clt/search/mod.rs:65-70, similarity mod.rs:30):
    over docs matching merge OR window, every term contributes
    ln((tf + mu*cp) / (dl + mu)) with tf = 0 when missing, cp = (ttf+1)/
    (C+1), mu = 2000 — tf/dlq from the INDEX, double precision, DuckDB
    recomputes from raw text."""
    import math

    from pyspark.sql import functions as F

    from lucene_rust_spark.entry_helpers import doc_id_from_path, gate_searcher
    from lucene_rust_spark.index.build import dl_decode_sql

    s = gate_searcher(spark, sf_dir)
    mu = 2000.0
    st = s.term_stats(["merge", "window"])
    terms = [t for t in ("merge", "window") if t in st]
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    cps = {
        t: (st[t]["total_term_freq"] + 1.0) / (s.sum_ttf + 1.0) for t in terms
    }
    joined = None
    for t in terms:
        p = s.term_postings(t).select(
            "doc_id",
            F.col("tf").alias(f"tf_{t}"),
            F.col("dlq").alias(f"dlq_{t}"),
        )
        joined = p if joined is None else joined.join(p, "doc_id", "full_outer")
    dlq = F.coalesce(*[F.col(f"dlq_{t}") for t in terms])
    dlv = F.expr(dl_decode_sql("dlq"))
    out = joined.withColumn("dlq", dlq)
    score = F.lit(0.0)
    for t in terms:
        tf = F.coalesce(F.col(f"tf_{t}"), F.lit(0)).cast("double")
        score = score + F.log((tf + mu * cps[t]) / (dlv + mu))
    out = out.select("doc_id", F.round(score, 4).alias("score"))
    return doc_id_from_path(s.fetch(out)).select(
        F.col("orig_doc_id").alias("doc_id"), "score"
    )


SQL_ENGINE_INDRI_AND_SCORES = f"""
{_TOKS_CTE},
dl AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM tk),
st AS (SELECT sum(dl)::BIGINT AS c FROM dl),
fl AS (SELECT tk.doc_id, u.term, count(*)::BIGINT AS tf
       FROM tk, unnest(toks) AS u(term) GROUP BY tk.doc_id, u.term),
cps AS (SELECT term, (sum(tf) + 1.0) / (st.c + 1.0) AS cp
        FROM fl CROSS JOIN st WHERE term IN ('merge', 'window')
        GROUP BY term, st.c),
m AS (SELECT DISTINCT doc_id FROM fl WHERE term IN ('merge', 'window')),
enc0 AS (SELECT m.doc_id, dl.dl FROM m JOIN dl USING (doc_id)),
enc AS (SELECT *,
  (CASE WHEN dl < {_N_FREE} THEN dl
   ELSE {_N_FREE} + (CASE WHEN length(bin(dl - {_N_FREE})) < 4 OR dl - {_N_FREE} = 0
                     THEN dl - {_N_FREE}
                     ELSE ((((dl - {_N_FREE}) >> (length(bin(dl - {_N_FREE})) - 4)) & 7)
                          | ((length(bin(dl - {_N_FREE})) - 4 + 1) << 3)) END)
   END) AS dlq FROM enc0),
dec AS (SELECT doc_id,
  (CASE WHEN dlq < {_N_FREE} THEN dlq
   ELSE {_N_FREE} + (CASE WHEN dlq - {_N_FREE} < 8 THEN (dlq - {_N_FREE}) & 15
                     ELSE (((dlq - {_N_FREE}) & 7) | 8) << (((dlq - {_N_FREE}) >> 3) - 1) END)
   END) AS dlv FROM enc),
terms2 AS (SELECT dec.doc_id, dec.dlv, cps.term, cps.cp,
           COALESCE(fl.tf, 0) AS tf
           FROM dec CROSS JOIN cps
           LEFT JOIN fl ON fl.doc_id = dec.doc_id AND fl.term = cps.term)
SELECT doc_id,
       round(sum(ln((tf + 2000.0 * cp) / (dlv + 2000.0))), 4) AS score
FROM terms2 GROUP BY doc_id
"""


def _engine_phrase_counts(spark, sf_dir):
    """Four positional operators in one gate row: exact PhraseQuery,
    sloppy slop=1 (pinned anchor semantics), 3-term sloppy slop=2 under
    EXACT Lucene SloppyPhraseScorer semantics (spread of adjusted
    positions), and MultiPhraseQuery (per-slot alternatives)."""
    from lucene_rust_spark.entry_helpers import gate_searcher
    from lucene_rust_spark.oracle.bm25 import multi_phrase_query, phrase_query

    s = gate_searcher(spark, sf_dir)
    row = (
        int(s.count(phrase_query(["merge", "window"]))),
        int(s.count(phrase_query(["merge", "window"], slop=1))),
        int(
            s.count(
                phrase_query(
                    ["merge", "window", "batch"], slop=2, slop_mode="lucene"
                )
            )
        ),
        int(s.count(multi_phrase_query([["merge", "batch"], ["window"]]))),
    )
    return spark.createDataFrame(
        [row], "n_phrase long, n_sloppy1 long, n_sloppy3 long, n_multi long"
    )


SQL_ENGINE_PHRASE_COUNTS = f"""
{_POS_CTE}
SELECT
 (SELECT count(DISTINCT a.doc_id) FROM pos a
   JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
   WHERE a.term = 'merge' AND b.term = 'window')::BIGINT AS n_phrase,
 (SELECT count(DISTINCT a.doc_id) FROM pos a
   JOIN pos b ON a.doc_id = b.doc_id AND abs(b.pos - a.pos - 1) <= 1
   WHERE a.term = 'merge' AND b.term = 'window')::BIGINT AS n_sloppy1,
 (SELECT count(DISTINCT a.doc_id) FROM pos a
   JOIN pos b ON a.doc_id = b.doc_id JOIN pos c ON a.doc_id = c.doc_id
   WHERE a.term = 'merge' AND b.term = 'window' AND c.term = 'batch'
   AND greatest(a.pos, b.pos - 1, c.pos - 2)
     - least(a.pos, b.pos - 1, c.pos - 2) <= 2)::BIGINT AS n_sloppy3,
 (SELECT count(DISTINCT a.doc_id) FROM pos a
   JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
   WHERE a.term IN ('merge', 'batch') AND b.term = 'window')::BIGINT AS n_multi
"""


def _engine_term_stats(spark, sf_dir):
    from pyspark.sql import functions as F

    from lucene_rust_spark.entry_helpers import gate_searcher

    s = gate_searcher(spark, sf_dir)
    return (
        s.terms.orderBy(F.desc("doc_freq"), F.asc("term"))
        .limit(20)
        .select(
            "term",
            F.col("doc_freq").cast("long").alias("doc_freq"),
            F.col("total_term_freq").cast("long").alias("ttf"),
        )
    )


def _engine_regexp_algebra_counts(spark, sf_dir):
    """Regexp automaton algebra end-to-end (clt/util/automaton/
    operations.rs:1-1042 — determinize / complement / intersect;
    reg_exp.rs grammar): three RegexpQuery counts through the engine's
    terms-dict expansion, each requiring the DFA path —
    complement+intersection (~(s@)&@a@: not s-initial AND contains a),
    intersection with bounded repeat ([a-z]{4,6}&@o@), and the
    double-complement identity (~(~(batch)) == batch)."""
    from lucene_rust_spark.entry_helpers import gate_searcher

    s = gate_searcher(spark, sf_dir)
    row = (
        int(s.count({"type": "regexp", "pattern": "~(s@)&@a@"})),
        int(s.count({"type": "regexp", "pattern": "[a-z]{4,6}&@o@"})),
        int(s.count({"type": "regexp", "pattern": "~(~(batch))"})),
    )
    return spark.createDataFrame(
        [row], "n_comp_inter long, n_inter_rep long, n_dbl_neg long"
    )


SQL_ENGINE_REGEXP_ALGEBRA_COUNTS = f"""
{_TOKS_CTE}
SELECT
 (SELECT count(*) FROM tk WHERE len(list_filter(toks,
   x -> NOT x LIKE 's%' AND x LIKE '%a%')) > 0)::BIGINT AS n_comp_inter,
 (SELECT count(*) FROM tk WHERE len(list_filter(toks,
   x -> regexp_full_match(x, '[a-z]{{4,6}}') AND x LIKE '%o%')) > 0)::BIGINT AS n_inter_rep,
 (SELECT count(*) FROM tk
   WHERE list_contains(toks, 'batch'))::BIGINT AS n_dbl_neg
"""


def _engine_delete_count(spark, sf_dir):
    """Tombstone live-docs view: delete every 'es' doc (metadata delete),
    then count 'merge' through the engine — validates the anti-join path
    without mutating the shared gate index."""
    from pyspark.sql import functions as F

    from lucene_rust_spark.entry_helpers import count_df, gate_searcher
    from lucene_rust_spark.search.searcher import IndexSearcher

    s = gate_searcher(spark, sf_dir)
    tomb = s.docmap.filter(F.col("lang") == "es").select("doc_id")
    s2 = IndexSearcher(spark, s.index_dir, tombstones=tomb)
    return count_df(spark, s2.count({"type": "term", "term": "merge"}))


def _engine_field_lang_count(spark, sf_dir):
    """Field-scoped term query through the multi-field index: lang:'en'."""
    from lucene_rust_spark.entry_helpers import count_df, mf_gate_searcher

    ms = mf_gate_searcher(spark, sf_dir)
    return count_df(
        spark, ms.count({"type": "term", "field": "lang_field", "term": "en"})
    )


def _engine_term_vector(spark, sf_dir):
    """Term-vector API (clt/codecs/lucene90/mod.rs:25 analog): per-doc
    (term, tf) derived from the postings by a zone-map block seek —
    checked against the oracle's per-doc counts for one fixed doc."""
    from pyspark.sql import functions as F

    from lucene_rust_spark.entry_helpers import gate_searcher

    s = gate_searcher(spark, sf_dir)
    row = s.docmap.filter(F.col("path") == "doc/7").select("doc_id").first()
    if row is None:
        return spark.createDataFrame([], "term string, tf long")
    return s.term_vector(int(row["doc_id"])).select(
        "term", F.col("tf").cast("long").alias("tf")
    )


def _engine_field_exists_count(spark, sf_dir):
    """FieldExistsQuery (clt/search/mod.rs field_exists_query): docs with
    >= 1 token in the sparse opt_field (empty for doc_id % 3 == 0) — the
    match set is a norms-column scan of that field's sub-index."""
    from lucene_rust_spark.entry_helpers import count_df, mf_gate_searcher

    ms = mf_gate_searcher(spark, sf_dir)
    return count_df(
        spark, ms.count({"type": "field_exists", "field": "opt_field"})
    )


def _engine_snippets(spark, sf_dir):
    """Offsets postings flag end-to-end (postings_enum.rs:63-67 + the
    UnifiedHighlighter offsets strategy): every 'merge' doc's FIRST
    occurrence char offsets decoded from the index, snippet cut from the
    stored text with one JVM substring. The documents text is single-space
    [a-z0-9_ ] so the DuckDB instr oracle computes the same offsets."""
    import os

    from pyspark.sql import functions as F

    from lucene_rust_spark.entry_helpers import doc_id_from_path, gate_searcher

    s = gate_searcher(spark, sf_dir)
    first = (
        s.term_offsets(["merge"])
        .groupBy("doc_id")
        .agg(F.min(F.struct("start", "end")).alias("fo"))
        .select("doc_id", F.col("fo.start").alias("start"), F.col("fo.end").alias("end"))
    )
    mapped = doc_id_from_path(s.fetch(first)).select(
        F.col("orig_doc_id").alias("doc_id"), "start", "end"
    )
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    j = mapped.join(docs, "doc_id")
    snip = F.substring(
        "text",
        (F.greatest(F.col("start") - 30, F.lit(0)) + 1).cast("int"),
        (F.col("end") - F.col("start") + 60).cast("int"),
    )
    return j.select("doc_id", "start", "end", snip.alias("snippet"))


def _engine_matches_spans(spark, sf_dir):
    """Matches API end-to-end (clt/search/matches.rs,
    term_matches_iterator.rs [stubs]; Weight#matches): every occurrence
    span of the phrase 'merge window' — token positions AND char offsets
    decoded from the positions/offsets postings streams, composed by the
    phrase anchor-chain span builder (search/matches.py). The documents
    text is single-space [a-z0-9_ ] tokens, so a DuckDB window-sum over
    token lengths recomputes the same offsets."""
    from pyspark.sql import functions as F

    from lucene_rust_spark.entry_helpers import doc_id_from_path, gate_searcher
    from lucene_rust_spark.oracle.bm25 import phrase_query

    s = gate_searcher(spark, sf_dir)
    spans = s.matches_df(phrase_query(["merge", "window"]))
    return doc_id_from_path(s.fetch(spans)).select(
        F.col("orig_doc_id").alias("doc_id"),
        F.col("position").cast("long").alias("position"),
        F.col("end_position").cast("long").alias("end_position"),
        F.col("start_offset").cast("long").alias("start_offset"),
        F.col("end_offset").cast("long").alias("end_offset"),
    )


def _engine_topk_by_field(spark, sf_dir):
    """TopFieldCollector (clt/search/mod.rs:157) through the engine: the
    'merge' match set ordered by stored docmap fields (lang asc, path
    desc) instead of relevance — k=15. path is unique per doc, so the
    sort is total and the oracle needs no engine-doc_id tiebreak."""
    from pyspark.sql import functions as F

    from lucene_rust_spark.entry_helpers import gate_searcher

    s = gate_searcher(spark, sf_dir)
    out = s.search_by_field(
        {"type": "term", "term": "merge"},
        [{"field": "lang"}, {"field": "path", "reverse": True}],
        k=15,
    )
    return out.select(
        F.split("path", "/").getItem(1).cast("long").alias("doc_id"), "lang", "path"
    )


def _engine_payload_sum(spark, sf_dir):
    """Payloads postings flag end-to-end (postings_enum.rs:70-76 +
    PayloadScoreQuery sum function): per-doc sum of the payload bytes
    (gate payload = position mod 7, occurrence-specific) over 'merge'
    occurrences, decoded from the index."""
    from pyspark.sql import functions as F

    from lucene_rust_spark.entry_helpers import doc_id_from_path, gate_searcher

    s = gate_searcher(spark, sf_dir)
    ps = s.payload_score("merge", fn="sum")
    return doc_id_from_path(s.fetch(ps)).select(
        F.col("orig_doc_id").alias("doc_id"),
        F.col("score").cast("long").alias("pay_sum"),
    )


def _engine_facets_lang(spark, sf_dir):
    """Facet counts (SortedSetDocValuesFacetCounts analog): lang value
    counts over the docs matching 'merge', top 10 by (count desc, lang)."""
    from lucene_rust_spark.entry_helpers import gate_searcher

    s = gate_searcher(spark, sf_dir)
    return s.facet_counts({"type": "term", "term": "merge"}, "lang", top_n=10)


def _engine_multi_collect(spark, sf_dir):
    """MultiCollector(Manager) end-to-end (clt/search/multi_collector.rs,
    caching_collector.rs): ONE persisted scored pass over the 'merge'
    match set feeds the hit count, the top-k collector, the threshold
    relation, and the lang facet — emitted as one gate row that DuckDB
    re-derives independently."""
    from lucene_rust_spark.search.collectors import multi_collect

    from lucene_rust_spark.entry_helpers import gate_searcher

    s = gate_searcher(spark, sf_dir)
    out = multi_collect(
        s,
        {"type": "term", "term": "merge"},
        k=10,
        with_count=True,
        count_threshold=50,
        facet_fields=("lang",),
        facet_top_n=1,
    )
    # count_threshold reports the bounded count; recover the exact total
    # from a replayed full count (still the same cached pass semantics)
    total = s.count({"type": "term", "term": "merge"})
    lang, n_lang = out["facets"]["lang"][0]
    return spark.createDataFrame(
        [(int(total), len(out["top_k"]), out["relation"], lang, int(n_lang))],
        "total_hits long, n_topk long, relation string, top_lang string,"
        " top_lang_n long",
    )


def _engine_count_threshold(spark, sf_dir):
    from lucene_rust_spark.entry_helpers import gate_searcher

    s = gate_searcher(spark, sf_dir)
    n, rel = s.count_with_threshold({"type": "term", "term": "merge"}, threshold=50)
    return spark.createDataFrame([(int(n), rel)], "n_hits long, relation string")

def _engine_explain(spark, sf_dir):
    """IndexSearcher.explain end-to-end (clt/search/explanation.rs +
    Weight.explain): explain 'merge' on the deterministic first matching
    doc, self-check the tree's float32 value against search()'s score,
    then emit the tree's INPUTS (tf, SmallFloat-decoded dl, df) plus the
    double-precision BM25 recomputed from those inputs — DuckDB
    re-derives all of it from the raw text."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from lucene_rust_spark.entry_helpers import gate_searcher

    s = gate_searcher(spark, sf_dir)
    q = {"type": "term", "term": "merge"}
    hits = s.search(q, k=100_000)
    schema = "doc_id long, tf long, dl long, df long, score double"
    if not hits:
        return spark.createDataFrame([], schema)
    ids = [d for d, _ in hits]
    rows = s.docmap.filter(F.col("doc_id").isin(ids)).select("doc_id", "path").collect()
    orig = {int(r["doc_id"]): int(r["path"].split("/")[1]) for r in rows}
    eng_doc = min(ids, key=lambda d: orig[d])
    score = dict(hits)[eng_doc]
    e = s.explain(q, eng_doc)
    if not e["match"] or np.float32(e["value"]) != np.float32(score):
        raise AssertionError(f"explain/search divergence: {e} vs {score}")
    idf_d, freq_d = e["details"]
    n = int(idf_d["details"][0]["value"])
    N = int(idf_d["details"][1]["value"])
    tf = int(freq_d["value"])
    dl = int(freq_d["details"][0]["value"])
    avgdl = float(freq_d["details"][1]["value"])
    val = round(
        math.log(1.0 + (N - n + 0.5) / (n + 0.5))
        * (tf / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))),
        4,
    )
    return spark.createDataFrame(
        [(orig[eng_doc], tf, dl, n, val)], schema
    )


SQL_ENGINE_EXPLAIN = SQL_ENGINE_BM25_SCORES.replace(
    """SELECT doc_id, tf::BIGINT AS tf, dlq::BIGINT AS dlq,
  round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        * (tf / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dlv / (sum_dl::DOUBLE / n_docs)))), 4) AS score
FROM dec""",
    """SELECT doc_id, tf::BIGINT AS tf, dlv::BIGINT AS dl, df::BIGINT AS df,
  round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        * (tf / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dlv / (sum_dl::DOUBLE / n_docs)))), 4) AS score
FROM dec WHERE doc_id = (SELECT min(doc_id) FROM dec)""",
)
assert "dlv::BIGINT AS dl" in SQL_ENGINE_EXPLAIN


def _engine_commit_travel(spark, sf_dir):
    """Point-in-time reads over retained commit points (clt/index/
    index_commit.rs, snapshot_deletion_policy.rs; DirectoryReader.open(
    IndexCommit)): a three-commit index — build on doc_id % 3 != 0,
    append the rest, delete every 'merge' doc — queried at all three
    views. Commit A must NOT see the appended docs, commit B must see
    them but NOT the deletes, and the live view applies the deletes;
    DuckDB re-derives each view from the raw table."""
    from lucene_rust_spark.entry_helpers import commit_gate_index
    from lucene_rust_spark.search.searcher import IndexSearcher

    idx, gen_build, gen_append = commit_gate_index(spark, sf_dir)
    q = {"type": "term", "term": "merge"}
    n_a = IndexSearcher(spark, idx, commit=gen_build).count(q)
    n_b = IndexSearcher(spark, idx, commit=gen_append).count(q)
    live = IndexSearcher(spark, idx)
    n_live_merge = live.count(q)
    n_live_window = live.count({"type": "term", "term": "window"})
    return spark.createDataFrame(
        [(int(n_a), int(n_b), int(n_live_merge), int(n_live_window))],
        "n_commit_build long, n_commit_append long, n_live_merge long,"
        " n_live_window long",
    )


SQL_ENGINE_COMMIT_TRAVEL = f"""
{_TOKS_CTE}
SELECT
 (SELECT count(*) FROM tk WHERE list_contains(toks, 'merge')
   AND doc_id % 3 <> 0)::BIGINT AS n_commit_build,
 (SELECT count(*) FROM tk
   WHERE list_contains(toks, 'merge'))::BIGINT AS n_commit_append,
 0::BIGINT AS n_live_merge,
 (SELECT count(*) FROM tk WHERE list_contains(toks, 'window')
   AND NOT list_contains(toks, 'merge'))::BIGINT AS n_live_window
"""


def _sf01_commit_travel(spark, sf_dir):
    """Commit-point time travel at bench scale (5,000-doc corpus): the
    same three-view check as engine_commit_travel, pinned to sf0.1."""
    return _engine_commit_travel(spark, "/root/testdata/sf0.1")


def _sf01_engine_bm25(spark, sf_dir):
    """The engine postings-scoring gate pinned to the sf0.1 bench corpus
    (5,000-doc index via gate_searcher's on-disk cache): FOR-block
    decode, SmallFloat norms, df/sum_ttf — verified at bench scale, not
    just the 500-row toy corpus."""
    return _engine_bm25_scores(spark, "/root/testdata/sf0.1")


_ENGINE_QUERIES = {
    "engine_bool_counts": (_engine_bool_counts, SQL_ENGINE_BOOL_COUNTS),
    "engine_bm25_scores": (_engine_bm25_scores, SQL_ENGINE_BM25_SCORES),
    "sf01_engine_bm25": (
        _sf01_engine_bm25,
        SQL_ENGINE_BM25_SCORES.replace(
            "FROM documents",
            "FROM read_parquet('/root/testdata/sf0.1/documents.parquet')",
        ),
    ),
    "engine_synonym_scores": (_engine_synonym_scores, SQL_ENGINE_SYNONYM_SCORES),
    "engine_blended_scores": (_engine_blended_scores, SQL_ENGINE_BLENDED_SCORES),
    "engine_indri_and_scores": (_engine_indri_and_scores, SQL_ENGINE_INDRI_AND_SCORES),
    "engine_phrase_counts": (_engine_phrase_counts, SQL_ENGINE_PHRASE_COUNTS),
    "engine_term_stats": (
        _engine_term_stats,
        f"{_TOKS_CTE}, fl AS (SELECT tk.doc_id, u.term, count(*)::BIGINT AS tf "
        "FROM tk, unnest(toks) AS u(term) GROUP BY tk.doc_id, u.term) "
        "SELECT term, count(*)::BIGINT AS doc_freq, sum(tf)::BIGINT AS ttf "
        "FROM fl GROUP BY term ORDER BY doc_freq DESC, term ASC LIMIT 20",
    ),
    "engine_regexp_algebra": (
        _engine_regexp_algebra_counts,
        SQL_ENGINE_REGEXP_ALGEBRA_COUNTS,
    ),
    "engine_commit_travel": (_engine_commit_travel, SQL_ENGINE_COMMIT_TRAVEL),
    "engine_explain": (_engine_explain, SQL_ENGINE_EXPLAIN),
    "sf01_commit_travel": (
        _sf01_commit_travel,
        SQL_ENGINE_COMMIT_TRAVEL.replace(
            "FROM documents",
            "FROM read_parquet('/root/testdata/sf0.1/documents.parquet')",
        ),
    ),
    "engine_delete_count": (
        _engine_delete_count,
        f"{_TOKS_CTE} SELECT count(*)::BIGINT AS n_hits "
        "FROM tk JOIN documents d ON tk.doc_id = d.doc_id "
        "WHERE list_contains(toks, 'merge') AND d.lang <> 'es'",
    ),
    "engine_field_lang_count": (
        _engine_field_lang_count,
        "SELECT count(*)::BIGINT AS n_hits FROM documents WHERE lang = 'en'",
    ),
    "engine_field_exists_count": (
        _engine_field_exists_count,
        "SELECT count(*)::BIGINT AS n_hits FROM documents WHERE doc_id % 3 <> 0",
    ),
    "engine_term_vector": (
        _engine_term_vector,
        f"{_TOKS_CTE} SELECT u.term, count(*)::BIGINT AS tf "
        "FROM tk, unnest(toks) AS u(term) WHERE tk.doc_id = 7 GROUP BY u.term",
    ),
    "engine_snippets": (
        _engine_snippets,
        # text is single-space-joined [a-z0-9_] tokens, so the padded
        # instr finds the first token-boundary occurrence: 1-based i of
        # the leading pad space => 0-based char start = i - 1
        "WITH m AS (SELECT doc_id, text, instr(' ' || text || ' ', ' merge ') AS i "
        "FROM documents WHERE instr(' ' || text || ' ', ' merge ') > 0) "
        "SELECT doc_id, (i - 1)::BIGINT AS start, (i + 4)::BIGINT AS \"end\", "
        "substr(text, greatest(i - 31, 0) + 1, 65) AS snippet FROM m",
    ),
    "engine_matches_spans": (
        _engine_matches_spans,
        # engine positions are 0-based; _POS_CTE is 1-based. char start
        # of 1-based token p = sum(len(prev tokens)) + (p - 1) spaces
        f"{_POS_CTE}, offs AS (SELECT doc_id, term, pos, "
        "(COALESCE(SUM(length(term)) OVER (PARTITION BY doc_id ORDER BY pos "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + pos - 1)::BIGINT"
        " AS cstart FROM pos) "
        "SELECT a.doc_id, (a.pos - 1)::BIGINT AS position, "
        "a.pos::BIGINT AS end_position, a.cstart AS start_offset, "
        "(b.cstart + length(b.term))::BIGINT AS end_offset "
        "FROM offs a JOIN offs b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
        "WHERE a.term = 'merge' AND b.term = 'window'",
    ),
    "engine_topk_by_field": (
        _engine_topk_by_field,
        f"{_TOKS_CTE} SELECT d.doc_id, d.lang, 'doc/' || d.doc_id AS path "
        "FROM tk JOIN documents d USING (doc_id) "
        "WHERE list_contains(toks, 'merge') "
        "ORDER BY d.lang ASC, path DESC LIMIT 15",
    ),
    "engine_payload_sum": (
        _engine_payload_sum,
        # engine positions are 0-based; _POS_CTE generates 1-based
        f"{_POS_CTE} SELECT doc_id, sum((pos - 1) % 7)::BIGINT AS pay_sum "
        "FROM pos WHERE term = 'merge' GROUP BY doc_id",
    ),
    "engine_facets_lang": (
        _engine_facets_lang,
        f"{_TOKS_CTE} SELECT d.lang, count(*)::BIGINT AS count "
        "FROM tk JOIN documents d ON tk.doc_id = d.doc_id "
        "WHERE list_contains(toks, 'merge') "
        "GROUP BY d.lang ORDER BY count DESC, d.lang ASC LIMIT 10",
    ),
    "engine_multi_collect": (
        _engine_multi_collect,
        f"{_TOKS_CTE}, m AS (SELECT tk.doc_id FROM tk "
        "WHERE list_contains(toks, 'merge')), "
        "fc AS (SELECT d.lang, count(*)::BIGINT AS c FROM m "
        "JOIN documents d USING (doc_id) GROUP BY d.lang "
        "ORDER BY c DESC, d.lang ASC LIMIT 1) "
        "SELECT (SELECT count(*) FROM m)::BIGINT AS total_hits, "
        "10::BIGINT AS n_topk, "
        "'GREATER_THAN_OR_EQUAL_TO' AS relation, "
        "fc.lang AS top_lang, fc.c AS top_lang_n FROM fc",
    ),
    "engine_count_threshold": (
        _engine_count_threshold,
        f"{_TOKS_CTE}, c AS (SELECT count(*)::BIGINT AS n FROM tk "
        "WHERE list_contains(toks, 'merge')) "
        "SELECT LEAST(n, 50)::BIGINT AS n_hits, "
        "CASE WHEN n > 50 THEN 'GREATER_THAN_OR_EQUAL_TO' ELSE 'EQUAL_TO' END AS relation "
        "FROM c",
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
