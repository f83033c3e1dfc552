"""Query execution: index loading (warmup), BM25 / sparse-dot top-k search.

Reference restatement (SURVEY.md §3.2/§3.3): the query actor pool IS the
warmup mechanism — each ``IndexSearcher`` loads its partitions' posting +
doc-length files once in ``__init__`` (the Ray analogue of
NeuralSparseIndexShard.warmUp, sparse/NeuralSparseIndexShard.java:82-104
and the node caches sparse/cache/*.java); ``SearchStage`` is the
``map_batches`` callable-class form for batch query evaluation.

Scoring parity: exact Lucene-default BM25 (query/bm25.py) with global
collection stats (N, avgdl, df summed across ALL segments and shards —
SURVEY.md §2.5 requires global stats for rank-identical scores). Ties
broken (score desc, doc_id asc) like Lucene's (score, doc) ordering.
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import BM25Config, QueryConfig
from ..index.codec import varint_decode
from ..index.manifest import DOCLEN_BUCKET, IndexManifest
from .bm25 import bm25_idf, bm25_score_terms, topk_desc


class IndexSearcher:
    """Holds decoded postings + doc lengths for a set of doc shards.

    ``shards=None`` loads every shard (single-actor / driver use at test
    scale); on a cluster each actor of the pool gets a disjoint shard
    subset and the driver merges per-shard top-k (partition-parallel
    query fan-out, the Ray analogue of OpenSearch shard search).
    """

    def __init__(self, index_dir: str, shards: list[int] | None = None):
        manifest = IndexManifest.load(index_dir)
        if manifest is None:
            raise FileNotFoundError(f"no index manifest in {index_dir}")
        self.manifest = manifest
        self.n_docs = manifest.n_docs
        self.avgdl = manifest.avgdl
        self.bm25 = BM25Config(**manifest.bm25)
        self.shards = (
            set(shards) if shards is not None else set(range(manifest.num_doc_shards))
        )
        # term → list[(doc_ids, tfs)] (may hold several entries per term:
        # one per segment; doc ranges are disjoint across segments/shards)
        self._postings: dict[str, list[tuple[np.ndarray, np.ndarray]]] = defaultdict(list)
        self._df: dict[str, int] = defaultdict(int)
        dl_docs: list[np.ndarray] = []
        dl_vals: list[np.ndarray] = []
        for seg in manifest.complete_segments():
            for f in seg["files"]:
                if f["doc_shard"] not in self.shards:
                    continue
                t = pq.read_table(os.path.join(index_dir, f["path"]))
                if f["term_bucket"] == DOCLEN_BUCKET:
                    dl_docs.append(t["doc_id"].to_numpy())
                    dl_vals.append(t["dl"].to_numpy())
                else:
                    terms = t["term"].to_pylist()
                    dfs = t["df"].to_numpy()
                    docs_bufs = t["docs"].to_pylist()
                    tfs_bufs = t["tfs"].to_pylist()
                    for term, df, db, tb in zip(terms, dfs, docs_bufs, tfs_bufs):
                        doc_ids = np.cumsum(varint_decode(db, int(df)))
                        tfs = varint_decode(tb, int(df))
                        self._postings[term].append((doc_ids, tfs))
                        self._df[term] += int(df)
        if dl_docs:
            all_docs = np.concatenate(dl_docs)
            all_dls = np.concatenate(dl_vals)
            order = np.argsort(all_docs, kind="stable")
            self._dl_doc_ids = all_docs[order]
            self._dl = all_dls[order].astype(np.int64)
        else:
            self._dl_doc_ids = np.empty(0, np.int64)
            self._dl = np.empty(0, np.int64)

    # ---- stats -----------------------------------------------------------
    def local_df(self, term: str) -> int:
        return self._df.get(term, 0)

    def doc_length(self, doc_ids: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(self._dl_doc_ids, doc_ids)
        return self._dl[pos]

    # ---- search ----------------------------------------------------------
    def _gather(self, terms: list[str]) -> tuple[list[np.ndarray], list[np.ndarray]]:
        term_docs, term_tfs = [], []
        for t in terms:
            segs = self._postings.get(t, [])
            if not segs:
                term_docs.append(np.empty(0, np.int64))
                term_tfs.append(np.empty(0, np.int64))
            elif len(segs) == 1:
                term_docs.append(segs[0][0])
                term_tfs.append(segs[0][1])
            else:
                d = np.concatenate([s[0] for s in segs])
                f = np.concatenate([s[1] for s in segs])
                order = np.argsort(d, kind="stable")
                term_docs.append(d[order])
                term_tfs.append(f[order])
        return term_docs, term_tfs

    def search_bm25(
        self,
        terms: list[str],
        k: int = 10,
        *,
        global_dfs: np.ndarray | None = None,
        query_weights: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k BM25 over this searcher's shards.

        ``global_dfs``: per-term GLOBAL document frequencies (when this
        searcher only holds a shard subset, the driver supplies them so
        idf is identical across the pool). Defaults to local df, which IS
        global when all shards are loaded.
        """
        terms = sorted(set(terms))  # deterministic accumulation order
        if global_dfs is None:
            dfs = np.asarray([self.local_df(t) for t in terms], dtype=np.float64)
        else:
            dfs = np.asarray(global_dfs, dtype=np.float64)
        term_docs, term_tfs = self._gather(terms)
        if not term_docs:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        all_docs = [d for d in term_docs if d.size]
        if not all_docs:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        cand = np.unique(np.concatenate(all_docs))
        scores = np.zeros(cand.size, dtype=np.float64)
        dl_cand = self.doc_length(cand)
        idfs = bm25_idf(dfs, self.n_docs)
        k1, b = self.bm25.k1, self.bm25.b
        norm_cand = k1 * (1.0 - b + b * dl_cand / self.avgdl)
        for i, (docs, tfs) in enumerate(zip(term_docs, term_tfs)):
            if docs.size == 0 or dfs[i] == 0:
                continue
            pos = np.searchsorted(cand, docs)
            tf = tfs.astype(np.float64)
            contrib = idfs[i] * tf / (tf + norm_cand[pos])
            if query_weights is not None:
                contrib = contrib * query_weights[i]
            scores[pos] += contrib
        return topk_desc(cand, scores, k)

    def search_sparse_dot(
        self, token_weights: dict[str, float], k: int = 10
    ) -> tuple[np.ndarray, np.ndarray]:
        """Sparse linear dot-product scoring: score(d) = Σ_t q_w(t)·tf_d(t).

        The rank_features/neural_sparse linear query path
        (query/NeuralSparseQueryBuilder.java:569-589) with tf as the doc
        weight (analyzer-based sparse encoding).
        """
        terms = sorted(token_weights)
        term_docs, term_tfs = self._gather(terms)
        nonempty = [d for d in term_docs if d.size]
        if not nonempty:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        cand = np.unique(np.concatenate(nonempty))
        scores = np.zeros(cand.size, dtype=np.float64)
        for t, docs, tfs in zip(terms, term_docs, term_tfs):
            if docs.size == 0:
                continue
            pos = np.searchsorted(cand, docs)
            scores[pos] += token_weights[t] * tfs.astype(np.float64)
        return topk_desc(cand, scores, k)


class SearchStage:
    """map_batches callable-class: batch-evaluate queries against the index.

    Actor-pool usage: ``queries_ds.map_batches(SearchStage,
    fn_constructor_kwargs=dict(index_dir=...), concurrency=N,
    batch_format="pyarrow")`` — index load happens once per actor
    (warmup-as-init, SURVEY.md §3.3).

    Input batch: (query_id:int64, query_text:string). Output: one row per
    hit (query_id, rank, doc_id, score).
    """

    def __init__(
        self,
        index_dir: str,
        k: int = 10,
        shards: list[int] | None = None,
        config: QueryConfig | None = None,
    ):
        from ..analysis.analyzer import tokenize
        from ..config import AnalyzerConfig

        self.searcher = IndexSearcher(index_dir, shards)
        self.k = config.k if config else k
        acfg = self.searcher.manifest.analyzer
        self._analyzer_cfg = AnalyzerConfig(**acfg)
        self._tokenize = tokenize

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["query_text"].to_pylist()
        ):
            terms = self._tokenize(qtext or "", self._analyzer_cfg)
            d, s = self.searcher.search_bm25(terms, self.k)
            qids.append(np.full(d.size, qid, dtype=np.int64))
            ranks.append(np.arange(1, d.size + 1, dtype=np.int64))
            docs.append(d)
            scores.append(s)
        cat = lambda xs, dt: np.concatenate(xs) if xs else np.empty(0, dt)  # noqa: E731
        return pa.table(
            {
                "query_id": cat(qids, np.int64),
                "rank": cat(ranks, np.int64),
                "doc_id": cat(docs, np.int64),
                "score": cat(scores, np.float64),
            }
        )
