"""HNSW graph ANN (Malkov & Yashunin, TPAMI 2018) — the graph tier.

OpenSearch's k-NN engine (the dense path the reference plugin's neural
queries delegate to) builds one HNSW graph PER SEGMENT and merges
shard top-k at the coordinator. Ray restatement:

- **build** (``build_hnsw_index``): hash-shard the embedding table
  (splitmix64 on vec_id — the same unbiased gate as ann/ivf.py), then
  ``groupby(shard).map_groups`` builds one graph per shard IN PARALLEL
  (the classic sequential insert, distances vectorized per expansion
  step) and persists it as Parquet adjacency rows + a vectors file +
  manifest — the segment-graph layout;
- **search** (``HNSWSearcher``): per-shard beam search, k-merge at the
  coordinator (lexsort by −sim, id — the repo-wide tie discipline).

Determinism end to end: level assignment is splitmix64(vec_id) (no RNG
state), insertion order is vec_id-sorted within a shard, and every
heap pops ties by id — two builds of the same table are identical.

EXACTNESS ESCAPE for the oracle: every node keeps an implicit level-0
CHAIN edge to its insertion-order neighbors (i−1, i+1) — zero storage,
just included at traversal time — so the level-0 graph is connected by
construction and beam search with ``ef >= |shard|`` provably visits
every node, i.e. returns the exact cosine top-k. That is the setting
the ``hnsw_ann`` queries() entry runs (the brute-force SQL oracle
applies verbatim, like ivf_ann at nprobe=all); approximate recall at
realistic ef is pytest-asserted.
"""

from __future__ import annotations

import heapq
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from .ivf import _mix64, _normalize

MANIFEST = "hnsw_manifest.json"
_MAX_LEVEL = 32


def _levels_for_ids(ids: np.ndarray, m_l: float) -> np.ndarray:
    """Deterministic HNSW level per id: u = splitmix64(id) mapped into
    (0, 1], level = floor(−ln(u) · mL) — the paper's geometric draw
    with the hash replacing the RNG."""
    h = _mix64(ids.astype(np.uint64))
    # 53-bit mantissa slice, +1 so u is never 0 (ln(0) = −inf)
    u = ((h >> np.uint64(11)).astype(np.float64) + 1.0) / float(1 << 53)
    return np.minimum(
        np.floor(-np.log(u) * m_l).astype(np.int64), _MAX_LEVEL
    )


class HNSWGraph:
    """One shard's graph over an in-memory (id, vector) set."""

    def __init__(self, M: int = 8, ef_construction: int = 64):
        self.M = int(M)
        self.M0 = 2 * self.M  # level-0 degree cap, per the paper
        self.ef_construction = int(ef_construction)
        self.m_l = 1.0 / np.log(self.M)
        self.ids: np.ndarray | None = None
        self.x: np.ndarray | None = None  # unit vectors, float64
        self.levels: np.ndarray | None = None
        self.adj: list[list[list[int]]] = []  # [node][level] -> ordinals
        self.entry: int = 0

    # -- traversal ----------------------------------------------------------

    def _neighbors(self, node: int, level: int) -> list[int]:
        nbrs = self.adj[node][level] if level < len(self.adj[node]) else []
        if level == 0:
            # implicit connectivity chain (see module docstring)
            n = len(self.adj)
            extra = [j for j in (node - 1, node + 1) if 0 <= j < n]
            return nbrs + extra
        return nbrs

    def _search_layer(
        self,
        q: np.ndarray,
        entries: list[int],
        ef: int,
        level: int,
        allowed: np.ndarray | None = None,
    ) -> list[tuple[float, int]]:
        """Beam search on one layer; returns up to ``ef`` (sim, ordinal)
        pairs. Heaps tie-break by ordinal so traversal is deterministic.
        ``allowed`` (bool per ordinal) is Lucene's filtered-HNSW
        contract: the beam TRAVERSES every node (filtered-out nodes
        keep the graph connected) but only filter-accepted nodes enter
        the result heap — no post-filter recall loss."""
        sims0 = self.x[entries] @ q
        visited = set(entries)
        # candidates: max-heap by sim; results: min-heap by sim
        cand = [(-s, e) for s, e in zip(sims0, entries)]
        heapq.heapify(cand)
        res = [
            (s, e)
            for s, e in zip(sims0, entries)
            if allowed is None or allowed[e]
        ]
        heapq.heapify(res)
        while cand:
            neg_s, c = heapq.heappop(cand)
            if len(res) >= ef and -neg_s < res[0][0]:
                break
            # mark-as-we-filter: also collapses the chain neighbor
            # duplicating a stored adjacency entry in the same list
            nbrs = []
            for j in self._neighbors(c, level):
                if j not in visited:
                    visited.add(j)
                    nbrs.append(j)
            if not nbrs:
                continue
            sims = self.x[nbrs] @ q
            for s, j in zip(sims, nbrs):
                if not res or len(res) < ef or s > res[0][0]:
                    heapq.heappush(cand, (-s, j))
                    if allowed is None or allowed[j]:
                        heapq.heappush(res, (float(s), j))
                        if len(res) > ef:
                            heapq.heappop(res)
        return res

    def _greedy_descend(self, q: np.ndarray, node: int, level: int) -> int:
        """ef=1 greedy walk on one layer (the upper-layer zoom-in)."""
        best = float(self.x[node] @ q)
        improved = True
        while improved:
            improved = False
            nbrs = self._neighbors(node, level)
            if not nbrs:
                break
            sims = self.x[nbrs] @ q
            i = int(np.argmax(sims))
            if sims[i] > best:
                best = float(sims[i])
                node = nbrs[i]
                improved = True
        return node

    @staticmethod
    def _top_m(pairs: list[tuple[float, int]], m: int) -> list[int]:
        pairs = sorted(pairs, key=lambda p: (-p[0], p[1]))
        return [j for _, j in pairs[:m]]

    # -- build --------------------------------------------------------------

    def fit(self, vectors: np.ndarray, ids: np.ndarray) -> "HNSWGraph":
        order = np.argsort(ids)  # insertion order = id order: determinism
        self.ids = np.asarray(ids)[order].astype(np.int64)
        self.x = _normalize(np.asarray(vectors, dtype=np.float64)[order])
        self.levels = _levels_for_ids(self.ids, self.m_l)
        n = self.ids.size
        self.adj = [
            [[] for _ in range(int(self.levels[i]) + 1)] for i in range(n)
        ]
        self.entry = 0
        top = int(self.levels[0])
        for i in range(1, n):
            q = self.x[i]
            l_i = int(self.levels[i])
            ep = self.entry
            for lev in range(top, l_i, -1):
                ep = self._greedy_descend(q, ep, lev)
            for lev in range(min(l_i, top), -1, -1):
                w = self._search_layer(q, [ep], self.ef_construction, lev)
                m = self.M0 if lev == 0 else self.M
                nbrs = self._top_m(w, m)
                self.adj[i][lev] = list(nbrs)
                for nb in nbrs:
                    lst = self.adj[nb][lev]
                    lst.append(i)
                    if len(lst) > m:
                        sims = self.x[lst] @ self.x[nb]
                        self.adj[nb][lev] = self._top_m(
                            list(zip(sims, lst)), m
                        )
                ep = nbrs[0] if nbrs else ep
            if l_i > top:
                top = l_i
                self.entry = i
        return self

    # -- query --------------------------------------------------------------

    def search(
        self,
        query: np.ndarray,
        k: int = 10,
        ef: int | None = None,
        accepted_ids: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k by cosine; ``ef >= n`` is provably exact (chain edges
        make level 0 connected ⇒ the beam visits every node — with a
        filter, of every ACCEPTED node, since traversal ignores the
        filter). ``accepted_ids``: sorted original-id whitelist (the
        k-NN plugin's efficient filtered search, filter applied DURING
        traversal, not post-filter)."""
        if self.ids is None or self.ids.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        allowed = None
        if accepted_ids is not None:
            allowed = np.isin(self.ids, accepted_ids)
            if not allowed.any():
                return np.empty(0, np.int64), np.empty(0, np.float64)
        q = np.asarray(query, dtype=np.float64)
        qn = np.linalg.norm(q)
        if qn > 0:
            q = q / qn
        ef = max(ef if ef is not None else 4 * k, k)
        node = self.entry
        for lev in range(int(self.levels[self.entry]), 0, -1):
            node = self._greedy_descend(q, node, lev)
        res = self._search_layer(q, [node], ef, 0, allowed=allowed)
        if not res:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        sims = np.array([s for s, _ in res])
        ords = np.array([j for _, j in res], dtype=np.int64)
        sel = np.lexsort((self.ids[ords], -sims))[:k]
        return self.ids[ords[sel]], sims[sel]


# -- distributed on-disk index -----------------------------------------------


def build_hnsw_index(
    ds: "ray.data.Dataset",
    out_dir: str,
    *,
    num_shards: int = 4,
    M: int = 8,
    ef_construction: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Per-shard graphs in parallel: hash-shard on splitmix64(id), ONE
    exchange, one graph build + Parquet flush per shard group. Layout:
    ``shard-K.vectors.parquet`` (ordinal-ordered ids + unit vectors +
    levels) and ``shard-K.graph.parquet`` ((ordinal, level, neighbor
    ordinals) rows), plus a manifest. Resume = manifest presence."""
    manifest_path = os.path.join(out_dir, MANIFEST)
    if os.path.exists(manifest_path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    def add_shard(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        shard = (_mix64(ids) % np.uint64(num_shards)).astype(np.int32)
        return batch.append_column("shard", pa.array(shard, pa.int32()))

    def build_shard(group: pa.Table) -> pa.Table:
        shard = int(group["shard"][0].as_py())
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = np.asarray(group[vec_col].to_pylist(), dtype=np.float64)
        g = HNSWGraph(M=M, ef_construction=ef_construction).fit(vecs, ids)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(g.ids, pa.int64()),
                    "unit": pa.array(list(g.x), pa.list_(pa.float64())),
                    "level": pa.array(g.levels, pa.int64()),
                }
            ),
            os.path.join(out_dir, f"shard-{shard}.vectors.parquet"),
        )
        rows_n, rows_l, rows_nb = [], [], []
        for node, per_level in enumerate(g.adj):
            for lev, nbrs in enumerate(per_level):
                rows_n.append(node)
                rows_l.append(lev)
                rows_nb.append(nbrs)
        pq.write_table(
            pa.table(
                {
                    "ordinal": pa.array(rows_n, pa.int32()),
                    "level": pa.array(rows_l, pa.int32()),
                    "neighbors": pa.array(rows_nb, pa.list_(pa.int32())),
                }
            ),
            os.path.join(out_dir, f"shard-{shard}.graph.parquet"),
        )
        return pa.table(
            {
                "shard": pa.array([shard], pa.int32()),
                "n": pa.array([ids.size], pa.int64()),
                "entry": pa.array([g.entry], pa.int64()),
            }
        )

    stats = (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(build_shard, batch_format="pyarrow")
        .take_all()  # one row per shard: the manifest, not the data
    )
    with open(manifest_path, "w") as f:
        json.dump(
            {
                "layout_version": 1,
                "num_shards": num_shards,
                "M": M,
                "ef_construction": ef_construction,
                "shards": sorted(stats, key=lambda r: r["shard"]),
            },
            f,
        )
    return out_dir


@ray.remote
class HNSWShardActor:
    """One shard's graph pinned in one actor — the cluster form: the
    graph loads once in __init__ (never per query), queries are small
    broadcast messages, only k-sized results return."""

    def __init__(self, index_dir: str, shard: int, entry: int):
        s = HNSWSearcher.__new__(HNSWSearcher)
        with open(os.path.join(index_dir, MANIFEST)) as f:
            s.manifest = json.load(f)
        s.index_dir = index_dir
        s._graphs = {}
        self.graph = s._graph(shard, entry)

    def search(
        self,
        query: np.ndarray,
        k: int,
        ef: int | None,
        accepted_ids: np.ndarray | None = None,
    ):
        ids, sims = self.graph.search(
            query, k=k, ef=ef, accepted_ids=accepted_ids
        )
        return ids, sims


class DistributedHNSWSearcher:
    """Actor-pool coordinator: one HNSWShardActor per shard, fan-out
    search, k-merge — identical results to the local HNSWSearcher by
    construction (same per-shard beam, same lexsort merge)."""

    def __init__(self, index_dir: str):
        with open(os.path.join(index_dir, MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest.get("layout_version", 0) != 1:
            raise ValueError(
                "unsupported hnsw index layout "
                f"{self.manifest.get('layout_version')!r}"
            )
        self.actors = [
            HNSWShardActor.remote(index_dir, s["shard"], s["entry"])
            for s in self.manifest["shards"]
        ]

    @property
    def max_shard_size(self) -> int:
        return max(s["n"] for s in self.manifest["shards"])

    def search(
        self,
        query: np.ndarray,
        k: int = 10,
        ef: int | None = None,
        accepted_ids: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        parts = ray.get(
            [
                a.search.remote(query, k, ef, accepted_ids)
                for a in self.actors
            ]
        )
        ids = np.concatenate([p[0] for p in parts])
        sims = np.concatenate([p[1] for p in parts])
        order = np.lexsort((ids, -sims))[:k]
        return ids[order], sims[order]

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []


class HNSWSearcher:
    """Coordinator over the per-shard graphs: each shard answers its own
    top-k (graphs load lazily, once), the merge is a k-sized lexsort —
    the k-NN plugin's segment-then-shard reduce. At cluster scale each
    shard graph lives in one actor; here they share a process."""

    def __init__(self, index_dir: str):
        with open(os.path.join(index_dir, MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest.get("layout_version", 0) != 1:
            raise ValueError(
                "unsupported hnsw index layout "
                f"{self.manifest.get('layout_version')!r}"
            )
        self.index_dir = index_dir
        self._graphs: dict[int, HNSWGraph] = {}

    @property
    def max_shard_size(self) -> int:
        return max(s["n"] for s in self.manifest["shards"])

    def _graph(self, shard: int, entry: int) -> HNSWGraph:
        g = self._graphs.get(shard)
        if g is not None:
            return g
        vt = pq.read_table(
            os.path.join(self.index_dir, f"shard-{shard}.vectors.parquet")
        )
        gt = pq.read_table(
            os.path.join(self.index_dir, f"shard-{shard}.graph.parquet")
        )
        g = HNSWGraph(self.manifest["M"], self.manifest["ef_construction"])
        g.ids = vt["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g.x = np.asarray(vt["unit"].to_pylist(), dtype=np.float64)
        g.levels = vt["level"].to_numpy(zero_copy_only=False)
        g.adj = [
            [[] for _ in range(int(lv) + 1)] for lv in g.levels
        ]
        ords = gt["ordinal"].to_numpy(zero_copy_only=False)
        levs = gt["level"].to_numpy(zero_copy_only=False)
        nbrs = gt["neighbors"].to_pylist()
        for o, lv, nb in zip(ords, levs, nbrs):
            g.adj[int(o)][int(lv)] = list(nb)
        g.entry = entry
        self._graphs[shard] = g
        return g

    def search(
        self,
        query: np.ndarray,
        k: int = 10,
        ef: int | None = None,
        accepted_ids: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        all_ids, all_sims = [], []
        for s in self.manifest["shards"]:
            ids, sims = self._graph(s["shard"], s["entry"]).search(
                query, k=k, ef=ef, accepted_ids=accepted_ids
            )
            all_ids.append(ids)
            all_sims.append(sims)
        ids = np.concatenate(all_ids)
        sims = np.concatenate(all_sims)
        order = np.lexsort((ids, -sims))[:k]
        return ids[order], sims[order]
