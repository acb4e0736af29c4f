"""Pure-Python rank oracle — exact re-implementation of the reference
scoring math for rank-identity tests (SURVEY.md §5, FIXTURES.md §5).

BM25: IDF ln(1 + (N - df + 0.5)/(df + 0.5)) (src/ir/retrieval/bm25.py:203);
term score idf * (tf(k1+1)/(tf + k1(1-b+b*dl/avgdl)) + delta) (:247-253);
additive over query terms, duplicates count (:231-238).

TF-IDF/VSM: doc weight (1 + log10 tf) * idf, L2-normalized; query weight
qtf * idf (the app's live path, src/ir_app/services/index_service.py:297-306
+ search_service.py:366-382); score = cosine dot product.

LM (Dirichlet): p(t|D) = (tf + mu * p(t|C)) / (dl + mu), log-space sum
(src/ir/retrieval/language_model_retrieval.py:190-341).

BIM: RSV = Σ ln((N - df + 0.5)/(df + 0.5)) over matching query terms
(src/ir/retrieval/bim.py:141-260, no-feedback weights).

Tie-break everywhere: (score desc, doc_id asc) — defined (SURVEY.md Q20).
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Sequence, Tuple

from .tokenize import py_tokenize


class OracleIndex:
    def __init__(self, docs: Sequence[Tuple[int, str]]):
        """docs: [(doc_id, text)]"""
        self.doc_ids = [d for d, _ in docs]
        self.doc_tf: Dict[int, Counter] = {}
        self.dl: Dict[int, int] = {}
        for doc_id, text in docs:
            toks = py_tokenize(text)
            self.doc_tf[doc_id] = Counter(toks)
            self.dl[doc_id] = len(toks)
        self.n_docs = len(self.doc_ids)
        self.avgdl = sum(self.dl.values()) / self.n_docs if self.n_docs else 0.0
        self.postings: Dict[str, Dict[int, int]] = {}
        for doc_id, tf in self.doc_tf.items():
            for term, f in tf.items():
                self.postings.setdefault(term, {})[doc_id] = f
        self.df = {t: len(p) for t, p in self.postings.items()}
        self.idf = {
            t: math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
            for t, df in self.df.items()
        }

    # -- BM25 ------------------------------------------------------------
    def bm25(
        self, query: str, k: int = 10, k1: float = 1.2, b: float = 0.75, delta: float = 0.0
    ) -> List[Tuple[int, float]]:
        terms = py_tokenize(query)
        candidates = set()
        for t in terms:
            candidates.update(self.postings.get(t, {}))
        scored = []
        for d in candidates:
            dl = self.dl[d]
            s = 0.0
            for t in terms:  # duplicates contribute multiple times
                tf = self.postings.get(t, {}).get(d)
                if not tf:
                    continue
                num = tf * (k1 + 1.0)
                den = tf + k1 * (1.0 - b + b * dl / self.avgdl)
                s += self.idf[t] * (num / den + delta)
            scored.append((d, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    # -- TF-IDF cosine ---------------------------------------------------
    def tfidf(self, query: str, k: int = 10) -> List[Tuple[int, float]]:
        qtf = Counter(py_tokenize(query))
        qvec = {t: f * self.idf.get(t, 0.0) for t, f in qtf.items()}
        scored = []
        for d, tf in self.doc_tf.items():
            dvec = {t: (1.0 + math.log10(f)) * self.idf[t] for t, f in tf.items()}
            norm = math.sqrt(sum(w * w for w in dvec.values()))
            if norm == 0:
                continue
            s = sum(qvec.get(t, 0.0) * (w / norm) for t, w in dvec.items())
            if s > 0:
                scored.append((d, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    # -- Dirichlet LM ------------------------------------------------------
    def lm_dirichlet(self, query: str, k: int = 10, mu: float = 2000.0) -> List[Tuple[int, float]]:
        terms = py_tokenize(query)
        total_tokens = sum(self.dl.values())
        cf = Counter()
        for t, p in self.postings.items():
            cf[t] = sum(p.values())
        # terms unseen in the collection (p(t|C)=0) are dropped — they would
        # contribute -inf to every candidate equally
        terms = [t for t in terms if t in self.postings]
        candidates = set()
        for t in terms:
            candidates.update(self.postings.get(t, {}))
        scored = []
        for d in candidates:
            dl = self.dl[d]
            s = 0.0
            for t in terms:
                p_c = cf[t] / total_tokens
                tf = self.postings.get(t, {}).get(d, 0)
                s += math.log((tf + mu * p_c) / (dl + mu))
            scored.append((d, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    # -- BIM ---------------------------------------------------------------
    def bim(self, query: str, k: int = 10) -> List[Tuple[int, float]]:
        terms = set(py_tokenize(query))
        candidates = set()
        for t in terms:
            candidates.update(self.postings.get(t, {}))
        scored = []
        for d in candidates:
            s = 0.0
            for t in terms:
                if d in self.postings.get(t, {}):
                    df = self.df[t]
                    s += math.log((self.n_docs - df + 0.5) / (df + 0.5))
            scored.append((d, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]
