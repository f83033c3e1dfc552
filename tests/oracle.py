"""Single-process BM25 oracle — the rank-identity reference for the engine.

Independent implementation: plain dict/Counter postings, float64 scoring,
same pinned semantics (SURVEY.md §7.2 item 5): exact dl, global stats,
idf = ln(1+(N-df+0.5)/(df+0.5)), tf/(tf+k1*(1-b+b*dl/avgdl)),
ties (score desc, doc_id asc), terms accumulated in sorted order.
"""

from __future__ import annotations

import math
from collections import Counter

from neural_search_ray.analysis.analyzer import tokenize
from neural_search_ray.config import AnalyzerConfig, BM25Config


class OracleIndex:
    def __init__(self, docs: dict[int, str], analyzer: AnalyzerConfig = AnalyzerConfig(),
                 norm_quantization: str = "none"):
        self.analyzer = analyzer
        self.norm_quantization = norm_quantization
        self.tf: dict[int, Counter] = {}
        self.df: Counter = Counter()
        self.dl: dict[int, int] = {}
        for doc_id, text in docs.items():
            toks = tokenize(text or "", analyzer)
            c = Counter(toks)
            self.tf[doc_id] = c
            self.dl[doc_id] = len(toks)
            for t in c:
                self.df[t] += 1
        if norm_quantization == "norm4":
            import numpy as np

            from neural_search_ray.query.bm25 import dl_quantize_norm4

            self.dl = {
                k: int(dl_quantize_norm4(np.asarray([v]))[0]) for k, v in self.dl.items()
            }
        self.n_docs = len(docs)
        self.avgdl = (sum(self.dl.values()) / self.n_docs) if self.n_docs else 0.0

    def search_bm25(self, query: str, k: int = 10, cfg: BM25Config = BM25Config()):
        terms = sorted(set(tokenize(query, self.analyzer)))
        scores: dict[int, float] = {}
        for t in terms:
            df = self.df.get(t, 0)
            if df == 0:
                continue
            idf = math.log1p((self.n_docs - df + 0.5) / (df + 0.5))
            for doc_id, c in self.tf.items():
                f = c.get(t, 0)
                if f == 0:
                    continue
                denom = f + cfg.k1 * (1 - cfg.b + cfg.b * self.dl[doc_id] / self.avgdl)
                scores[doc_id] = scores.get(doc_id, 0.0) + idf * f / denom
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [d for d, _ in ranked], [s for _, s in ranked]

    def search_sparse_dot(self, token_weights: dict[str, float], k: int = 10):
        scores: dict[int, float] = {}
        for t in sorted(token_weights):
            w = token_weights[t]
            for doc_id, c in self.tf.items():
                f = c.get(t, 0)
                if f:
                    scores[doc_id] = scores.get(doc_id, 0.0) + w * f
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [d for d, _ in ranked], [s for _, s in ranked]
