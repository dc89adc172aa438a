"""Pure-Python BM25 oracle — plays the role Elasticsearch plays for the
reference: an independent implementation the Spark engine must match
rank-identically (same tokenizer spec, k1=1.2, b=0.75, Lucene-style idf).

Deliberately naive (dicts + loops, no numpy) so a bug in the vectorized
engine cannot be mirrored here.
"""

from __future__ import annotations

import math

from ..functions.tokenizer import tokenize_py


class BM25Oracle:
    def __init__(self, docs: dict[int, str], k1: float = 1.2, b: float = 0.75):
        """docs: doc_id -> raw text."""
        self.k1, self.b = k1, b
        self.tf: dict[int, dict[str, int]] = {}
        self.df: dict[str, int] = {}
        self.dl: dict[int, int] = {}
        for doc_id, text in docs.items():
            toks = tokenize_py(text)
            counts: dict[str, int] = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            self.tf[doc_id] = counts
            self.dl[doc_id] = len(toks)
            for t in counts:
                self.df[t] = self.df.get(t, 0) + 1
        self.n_docs = len(docs)
        self.avgdl = sum(self.dl.values()) / self.n_docs if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        seen: set[str] = set()
        terms = []
        for t in tokenize_py(query):
            if t not in seen:
                seen.add(t)
                terms.append(t)
        scores: dict[int, float] = {}
        c = self.k1 + 1.0
        for t in terms:
            if t not in self.df:
                continue
            idf = self.idf(t)
            for doc_id, counts in self.tf.items():
                tf = counts.get(t)
                if not tf:
                    continue
                w = tf / (
                    tf + self.k1 * (1.0 - self.b + self.b * self.dl[doc_id] / self.avgdl)
                )
                scores[doc_id] = scores.get(doc_id, 0.0) + idf * c * w
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
