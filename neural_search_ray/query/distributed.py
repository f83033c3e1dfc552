"""Distributed query execution: shard-parallel actor fan-out.

The Ray restatement of OpenSearch's coordinator → data-node shard search
(SURVEY.md §3.2): a pool of ``ShardSearchActor``s each holds a disjoint
doc-shard subset (warmup in __init__); the driver resolves GLOBAL term
statistics first (df summed over actors — the coordinator's role; global
stats are required for rank-identical BM25, SURVEY.md §2.5), broadcasts
(terms, dfs) with each query, and merges per-shard top-k with the same
(score desc, doc_id asc) ordering — proven equal to a single-searcher
run in tests/test_engine_advanced.py.

At 256-node scale this is the serving topology: actors pinned per node
via ``ray.remote(num_cpus=...)``, shard assignment from the manifest,
query batches routed with ``map_batches`` or direct actor calls.
"""

from __future__ import annotations

import numpy as np

import ray

from .engine import IndexSearcher, topk_desc


@ray.remote
class ShardSearchActor:
    def __init__(self, index_dir: str, shards: list[int]):
        self.searcher = IndexSearcher(index_dir, shards=shards)

    def stats(self) -> tuple[int, float]:
        """(n_docs via manifest, sum_dl) — identical on every actor since
        the manifest is global; kept for interface completeness."""
        return self.searcher.n_docs, self.searcher.avgdl

    def local_dfs(self, terms: list[str]) -> list[int]:
        return [self.searcher.local_df(t) for t in terms]

    def search(
        self, terms: list[str], k: int, global_dfs: list[float]
    ) -> tuple[np.ndarray, np.ndarray]:
        return self.searcher.search_bm25(
            terms, k, global_dfs=np.asarray(global_dfs, dtype=np.float64)
        )

    def warm(self, terms: list[str]) -> int:
        return self.searcher.warm_terms(terms)


class DistributedSearcher:
    """Driver-side handle: builds the actor pool over disjoint shard
    subsets and runs coordinator-reduce queries."""

    def __init__(self, index_dir: str, num_actors: int = 2):
        from ..index.manifest import IndexManifest

        manifest = IndexManifest.load(index_dir)
        if manifest is None:
            raise FileNotFoundError(index_dir)
        shards = list(range(manifest.num_doc_shards))
        chunks = [shards[i::num_actors] for i in range(num_actors)]
        chunks = [c for c in chunks if c]
        self.actors = [
            ShardSearchActor.remote(index_dir, c) for c in chunks
        ]
        # coordinator-side global-df cache: dfs are immutable for a built
        # index, so each term pays the phase-1 fan-out ONCE — warm
        # queries are a single RPC round (halves steady-state latency)
        self._gdf: dict[str, float] = {}

    def warmup(self, term_lists: list[list[str]]) -> None:
        """Batched cache warmup for an expected query workload — the
        reference's explicit warmup API (SURVEY.md §3.3). ONE df
        fan-out round for every distinct term, then one RPC per actor
        that decodes postings + builds block-max metadata in-actor —
        versus 2 RPC rounds per query when warming by just running the
        workload."""
        terms = sorted({t for ts in term_lists for t in ts})
        missing = [t for t in terms if t not in self._gdf]
        if missing:
            local = ray.get([a.local_dfs.remote(missing) for a in self.actors])
            sums = np.asarray(local, dtype=np.float64).sum(axis=0)
            self._gdf.update(zip(missing, sums.tolist()))
        ray.get([a.warm.remote(terms) for a in self.actors])

    def search_bm25(self, terms: list[str], k: int = 10):
        terms = sorted(set(terms))
        # phase 1 (coordinator): global df = Σ local df, for terms not
        # already cached
        missing = [t for t in terms if t not in self._gdf]
        if missing:
            local = ray.get([a.local_dfs.remote(missing) for a in self.actors])
            sums = np.asarray(local, dtype=np.float64).sum(axis=0)
            self._gdf.update(zip(missing, sums.tolist()))
        gdfs = np.asarray([self._gdf[t] for t in terms], dtype=np.float64)
        # phase 2: fan out with global stats, merge per-shard top-k
        parts = ray.get(
            [a.search.remote(terms, k, gdfs.tolist()) for a in self.actors]
        )
        docs = np.concatenate([p[0] for p in parts])
        scores = np.concatenate([p[1] for p in parts])
        return topk_desc(docs, scores, k)

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
