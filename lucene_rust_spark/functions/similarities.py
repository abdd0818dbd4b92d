"""Pluggable similarities (SURVEY.md §2.6). Reference surface:
clt/search/similarities/mod.rs:1-46 (BM25 / Classic TF-IDF / Boolean and
the DFR/IB/LM families, all [stub]). Each similarity is a pair of float32
kernels (idf, per-posting score) shared verbatim by the Spark decode kernel
and the oracle — the same construction that makes BM25 rank-identity hold.

Semantics pinned here (the reference files are stubs):
- bm25     : FIXTURES.md §3 (Lucene 9 formula, quantized norms)
- classic  : sqrt(tf) * idf^2 / sqrt(dl), idf = 1 + ln(N / (df + 1)),
             dl = SmallFloat-decoded doc length (>= 1)
- boolean  : matching docs score 1.0 (BooleanSimilarity)
"""

from __future__ import annotations

import numpy as np

from lucene_rust_spark.functions import kernels as K


class Similarity:
    name = "base"

    def __init__(self, doc_count: int, sum_ttf: int):
        self.doc_count = doc_count
        self.sum_ttf = sum_ttf
        self.avgdl = np.float32(np.float64(sum_ttf) / np.float64(max(doc_count, 1)))

    def idf(self, doc_freq: int) -> np.float32:
        raise NotImplementedError

    def weight(self, doc_freq: int, total_term_freq: int) -> np.float32:
        """Per-term statistic fed to score() — idf for tf-idf families,
        collection LM probability for the LM families."""
        return self.idf(doc_freq)

    def score(self, tf: np.ndarray, dlq: np.ndarray, idf: np.ndarray) -> np.ndarray:
        raise NotImplementedError


class BM25(Similarity):
    name = "bm25"

    def __init__(self, doc_count: int, sum_ttf: int):
        super().__init__(doc_count, sum_ttf)
        self.cache = K.bm25_norm_cache(self.avgdl)

    def idf(self, doc_freq: int) -> np.float32:
        return K.bm25_idf(doc_freq, self.doc_count)

    def score(self, tf, dlq, idf):
        return K.bm25_score(tf, dlq, idf, self.cache)

    def upper_bound(self, max_tf, min_dlq, idf):
        return K.bm25_upper_bound(max_tf, min_dlq, idf, self.cache)


class ClassicTFIDF(Similarity):
    name = "classic"

    def __init__(self, doc_count: int, sum_ttf: int):
        super().__init__(doc_count, sum_ttf)
        dl = np.maximum(K.byte4_to_int(np.arange(256)), 1).astype(np.float32)
        self.inv_sqrt_dl = (np.float32(1.0) / np.sqrt(dl)).astype(np.float32)

    def idf(self, doc_freq: int) -> np.float32:
        n = np.float64(self.doc_count)
        return np.float32(np.float32(1.0) + np.float32(np.log(n / np.float64(doc_freq + 1))))

    def score(self, tf, dlq, idf):
        tfn = np.sqrt(tf.astype(np.float32)).astype(np.float32)
        i = idf.astype(np.float32)
        return (tfn * (i * i) * self.inv_sqrt_dl[np.asarray(dlq, dtype=np.int64) & 0xFF]).astype(
            np.float32
        )


class Boolean(Similarity):
    name = "boolean"

    def idf(self, doc_freq: int) -> np.float32:
        return np.float32(1.0)

    def score(self, tf, dlq, idf):
        return np.ones(len(tf), dtype=np.float32)


class LMDirichlet(Similarity):
    """LMDirichletSimilarity (clt/search/similarities/mod.rs:1-46 [stub];
    Lucene 9 public formula, mu=2000): score = log(1 + tf/(mu*P(t|C))) +
    log(mu/(dl+mu)), clamped at 0; dl is the SmallFloat-decoded norm.
    All float32, pinned op order."""

    name = "lmd"
    MU = np.float32(2000.0)

    def __init__(self, doc_count: int, sum_ttf: int):
        super().__init__(doc_count, sum_ttf)
        self.dl_cache = K.byte4_to_int(np.arange(256)).astype(np.float32)

    def idf(self, doc_freq: int) -> np.float32:
        return np.float32(1.0)  # LM has no idf; weight() carries P(t|C)

    def weight(self, doc_freq: int, total_term_freq: int) -> np.float32:
        return np.float32(
            np.float64(max(total_term_freq, 1)) / np.float64(max(self.sum_ttf, 1))
        )

    def score(self, tf, dlq, idf):
        w = idf.astype(np.float32)  # P(t|C)
        tf32 = tf.astype(np.float32)
        dl = self.dl_cache[np.asarray(dlq, dtype=np.int64) & 0xFF]
        s = np.log1p(tf32 / (self.MU * w)).astype(np.float32) + np.log(
            self.MU / (dl + self.MU)
        ).astype(np.float32)
        return np.maximum(s.astype(np.float32), np.float32(0.0))


class LMJelinekMercer(Similarity):
    """LMJelinekMercerSimilarity (Lucene 9 public formula, lambda=0.1):
    score = log(1 + ((1-l)*tf/dl) / (l*P(t|C))), clamped at 0."""

    name = "lmjm"
    LAMBDA = np.float32(0.1)

    def __init__(self, doc_count: int, sum_ttf: int):
        super().__init__(doc_count, sum_ttf)
        self.dl_cache = np.maximum(K.byte4_to_int(np.arange(256)), 1).astype(np.float32)

    def idf(self, doc_freq: int) -> np.float32:
        return np.float32(1.0)

    def weight(self, doc_freq: int, total_term_freq: int) -> np.float32:
        return np.float32(
            np.float64(max(total_term_freq, 1)) / np.float64(max(self.sum_ttf, 1))
        )

    def score(self, tf, dlq, idf):
        w = idf.astype(np.float32)
        tf32 = tf.astype(np.float32)
        dl = self.dl_cache[np.asarray(dlq, dtype=np.int64) & 0xFF]
        one_m = np.float32(1.0) - self.LAMBDA
        s = np.log1p((one_m * tf32 / dl) / (self.LAMBDA * w)).astype(np.float32)
        return np.maximum(s, np.float32(0.0))


class DFRInL2(Similarity):
    """DFR I(n)L2 (clt/search/similarities/mod.rs:1-46 [stub]; Amati &
    van Rijsbergen's published DFR framework, the combo Lucene ships as
    DFRSimilarity(BasicModelIn, AfterEffectL, NormalizationH2, c=1)):
        tfn   = tf * log2(1 + avgdl / dl)          (H2, c=1)
        score = tfn / (tfn + 1) * log2((N+1) / (df+0.5))   (L after-effect x In)
    dl = SmallFloat-decoded norm clamped >= 1; all float32, pinned op order."""

    name = "dfr_inl2"

    def __init__(self, doc_count: int, sum_ttf: int):
        super().__init__(doc_count, sum_ttf)
        self.dl_cache = np.maximum(K.byte4_to_int(np.arange(256)), 1).astype(np.float32)

    def idf(self, doc_freq: int) -> np.float32:
        return np.float32(
            np.log2(np.float64(self.doc_count + 1) / (np.float64(doc_freq) + 0.5))
        )

    def score(self, tf, dlq, idf):
        dl = self.dl_cache[np.asarray(dlq, dtype=np.int64) & 0xFF]
        tfn = (tf.astype(np.float32) * np.log2(np.float32(1.0) + self.avgdl / dl)).astype(
            np.float32
        )
        return ((tfn / (tfn + np.float32(1.0))) * idf.astype(np.float32)).astype(np.float32)


class IBLogLogistic(Similarity):
    """IB LL (information-based, Clinchant & Gaussier SIGIR'10; Lucene ships
    it as IBSimilarity(DistributionLL, LambdaDF, NormalizationH2)):
        lambda = (df + 1) / (N + 1)
        tfn    = tf * log2(1 + avgdl / dl)          (H2, c=1)
        score  = ln((tfn + lambda) / lambda)
    All float32, pinned op order; dl clamped >= 1."""

    name = "ib_ll"

    def __init__(self, doc_count: int, sum_ttf: int):
        super().__init__(doc_count, sum_ttf)
        self.dl_cache = np.maximum(K.byte4_to_int(np.arange(256)), 1).astype(np.float32)

    def idf(self, doc_freq: int) -> np.float32:
        return np.float32(1.0)

    def weight(self, doc_freq: int, total_term_freq: int) -> np.float32:
        return np.float32(np.float64(doc_freq + 1) / np.float64(self.doc_count + 1))

    def score(self, tf, dlq, idf):
        lam = idf.astype(np.float32)
        dl = self.dl_cache[np.asarray(dlq, dtype=np.int64) & 0xFF]
        tfn = (tf.astype(np.float32) * np.log2(np.float32(1.0) + self.avgdl / dl)).astype(
            np.float32
        )
        return np.log((tfn + lam) / lam).astype(np.float32)


class DFIStandardized(Similarity):
    """DFI with the standardized independence measure (Kocabas et al.'s
    published divergence-from-independence model; Lucene ships it as
    DFISimilarity(IndependenceStandardized)):
        expected = (ttf / sumTotalTermFreq) * dl
        score    = log2(1 + (tf - expected)/sqrt(expected)),  0 when tf <= expected
    All float32, pinned op order; dl clamped >= 1."""

    name = "dfi"

    def __init__(self, doc_count: int, sum_ttf: int):
        super().__init__(doc_count, sum_ttf)
        self.dl_cache = np.maximum(K.byte4_to_int(np.arange(256)), 1).astype(np.float32)

    def idf(self, doc_freq: int) -> np.float32:
        return np.float32(1.0)

    def weight(self, doc_freq: int, total_term_freq: int) -> np.float32:
        return np.float32(
            np.float64(max(total_term_freq, 1)) / np.float64(max(self.sum_ttf, 1))
        )

    def score(self, tf, dlq, idf):
        w = idf.astype(np.float32)  # ttf / sumTotalTermFreq
        dl = self.dl_cache[np.asarray(dlq, dtype=np.int64) & 0xFF]
        e = (w * dl).astype(np.float32)
        m = ((tf.astype(np.float32) - e) / np.sqrt(e)).astype(np.float32)
        # tf <= expected => m+1 clamps to 1 => log2 = 0 (no divergence)
        return np.log2(np.maximum(m + np.float32(1.0), np.float32(1.0))).astype(np.float32)


class AxiomaticF2EXP(Similarity):
    """Axiomatic F2EXP (Fang & Zhai's axiomatic retrieval framework;
    Lucene ships it as AxiomaticF2EXP, the Axiomatic family default;
    reference surface clt/search/similarities/mod.rs:1-46 [stub]).
    Pinned (s=0.5, k=0.35):
        score = ((N + 1) / df)^k * tf / (tf + s + s * dl / avgdl)
    dl = SmallFloat-decoded norm; all float32, pinned op order."""

    name = "ax_f2exp"
    S = np.float32(0.5)
    KEXP = np.float32(0.35)  # not 'K': that names the kernels module here

    def __init__(self, doc_count: int, sum_ttf: int):
        super().__init__(doc_count, sum_ttf)
        self.dl_cache = K.byte4_to_int(np.arange(256)).astype(np.float32)

    def idf(self, doc_freq: int) -> np.float32:
        return np.float32(
            np.power(np.float64(self.doc_count + 1) / np.float64(doc_freq), np.float64(self.KEXP))
        )

    def score(self, tf, dlq, idf):
        dl = self.dl_cache[np.asarray(dlq, dtype=np.int64) & 0xFF]
        tf32 = tf.astype(np.float32)
        denom = tf32 + self.S + self.S * dl / self.avgdl
        return (idf.astype(np.float32) * (tf32 / denom)).astype(np.float32)


class MultiSimilarity(Similarity):
    """Averaging wrapper (Lucene MultiSimilarity; reference surface
    clt/search/similarities/mod.rs:1-46 [stub]): score = arithmetic mean
    of the sub-similarities' scores, float32.

    The scoring pipeline carries exactly ONE float32 per-term statistic
    from the driver-side stats gather into the decode kernels, so
    weight() interns each (per-sub weight) tuple in a registry and
    returns its id — exact through a float32 round trip for ids < 2^24.
    The registry is populated driver-side (term_stats runs before any
    kernel closure is pickled), so executors see a consistent snapshot.
    Phrase/dismax paths sum raw idfs and are NOT defined for this
    wrapper — idf() raises."""

    name = "multi"
    SUBS = ("bm25", "classic")

    def __init__(self, doc_count: int, sum_ttf: int):
        super().__init__(doc_count, sum_ttf)
        self.subs = [get_similarity(s, doc_count, sum_ttf) for s in self.SUBS]
        self._registry: list[tuple] = []

    def idf(self, doc_freq: int) -> np.float32:
        raise NotImplementedError(
            "MultiSimilarity carries per-sub weights; phrase/dismax idf "
            "summation is undefined for the averaging wrapper"
        )

    def weight(self, doc_freq: int, total_term_freq: int) -> np.float32:
        w = tuple(
            np.float32(s.weight(doc_freq, total_term_freq)) for s in self.subs
        )
        self._registry.append(w)
        return np.float32(len(self._registry) - 1)

    def score(self, tf, dlq, idf):
        ids = np.asarray(idf, dtype=np.int64)
        acc = np.zeros(len(tf), dtype=np.float32)
        for j, s in enumerate(self.subs):
            w = np.fromiter(
                (self._registry[i][j] for i in ids), dtype=np.float32, count=len(ids)
            )
            acc = (acc + s.score(tf, dlq, w)).astype(np.float32)
        return (acc / np.float32(len(self.subs))).astype(np.float32)


class IndriDirichlet(Similarity):
    """IndriDirichletSimilarity (clt/search/similarities/mod.rs:30
    indri_dirichlet_similarity [stub]; Lucene 9 public formula, mu=2000):
    score = log((tf + mu * P(t|C)) / (dl + mu)) with the Indri
    collection probability P(t|C) = (ttf + 1) / (C + 1). Unlike
    LMDirichlet there is NO clamp at 0 — Indri keeps negative log-probs,
    which is what makes the smoothed-AND combination (indri_and query)
    meaningful. All float32, pinned op order."""

    name = "indri"
    MU = np.float32(2000.0)

    def __init__(self, doc_count: int, sum_ttf: int):
        super().__init__(doc_count, sum_ttf)
        self.dl_cache = K.byte4_to_int(np.arange(256)).astype(np.float32)

    def idf(self, doc_freq: int) -> np.float32:
        return np.float32(1.0)  # weight() carries P(t|C)

    def weight(self, doc_freq: int, total_term_freq: int) -> np.float32:
        return np.float32(
            (np.float64(total_term_freq) + 1.0) / (np.float64(self.sum_ttf) + 1.0)
        )

    def score(self, tf, dlq, idf):
        w = idf.astype(np.float32)  # P(t|C)
        tf32 = tf.astype(np.float32)
        dl = self.dl_cache[np.asarray(dlq, dtype=np.int64) & 0xFF]
        return np.log((tf32 + self.MU * w) / (dl + self.MU)).astype(np.float32)

    def zero_score(self, dlq, w: np.float32) -> np.ndarray:
        """Smoothed zero-frequency score log(mu*P(t|C)/(dl+mu)) — what a
        doc MISSING the term contributes under the Indri AND."""
        dl = self.dl_cache[np.asarray(dlq, dtype=np.int64) & 0xFF]
        return np.log((self.MU * np.float32(w)) / (dl + self.MU)).astype(np.float32)


SIMILARITIES = {
    "bm25": BM25,
    "classic": ClassicTFIDF,
    "boolean": Boolean,
    "lmd": LMDirichlet,
    "lmjm": LMJelinekMercer,
    "dfr_inl2": DFRInL2,
    "ib_ll": IBLogLogistic,
    "dfi": DFIStandardized,
    "ax_f2exp": AxiomaticF2EXP,
    "multi": MultiSimilarity,
    "indri": IndriDirichlet,
}


def get_similarity(name: str, doc_count: int, sum_ttf: int) -> Similarity:
    return SIMILARITIES[name](doc_count, sum_ttf)
