"""Percolator — reverse search, restated Ray-Data-first.

OpenSearch/Lucene percolation (the `percolator` field type /
PercolateQuery) inverts retrieval: QUERIES are indexed, DOCUMENTS are
the stream, and each arriving doc reports which stored queries it
satisfies (alerting / saved-search / routing workloads). This is a
beyond-reference operator for this engine (the reference plugin calls
into core percolation rather than reimplementing it); semantics here
are the match query with ``operator=AND``: a stored query matches a doc
iff EVERY distinct analyzed query term occurs in the doc — optionally
AND-ed with metadata CRITERIA (the percolator's bool-with-range form:
``(column, op, value)`` predicates over the document batch's metadata
columns, evaluated as ONE Arrow kernel per stored query per batch,
never per row).

Ray-Data-first shape: the stored-query set is tiny (user alert rules),
so it compiles once into a term→query-slot inverted map that ships
inside the map_batches closure; the 100-TB document stream never
shuffles — each batch is analyzed with the engine's own analyzer
(`stages/tfvec.doc_term_tf`, one Arrow pass), batch-unique terms probe
the map (per-UNIQUE-term work, never per row), and per-(doc, query)
distinct-match counts come from one vectorized unique-with-counts.
A doc matches when its count equals the query's required-term count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..analysis.analyzer import AnalyzerConfig, tokenize
from ..stages.tfvec import doc_term_tf


class PercolateIndex:
    """Compiled stored-query set: term → query slots, slot → need."""

    _OPS = {
        "==": "equal", "!=": "not_equal", "<": "less",
        "<=": "less_equal", ">": "greater", ">=": "greater_equal",
    }

    def __init__(
        self,
        queries: list[tuple],
        analyzer_cfg: AnalyzerConfig = AnalyzerConfig(),
    ):
        self.cfg = analyzer_cfg
        qids, needs = [], []
        term_slots: dict[str, list[int]] = {}
        self.criteria: dict[int, list[tuple]] = {}  # slot -> predicates
        for q in queries:
            qid, qtext = q[0], q[1]
            crits = list(q[2]) if len(q) > 2 and q[2] else []
            for col, op, _val in crits:
                if op not in self._OPS:
                    raise ValueError(f"unknown criteria op {op!r}")
            terms = sorted(set(tokenize(qtext, analyzer_cfg)))
            if not terms:
                continue  # an empty analyzed query matches nothing
            slot = len(qids)
            qids.append(qid)
            needs.append(len(terms))
            if crits:
                self.criteria[slot] = crits
            for t in terms:
                term_slots.setdefault(t, []).append(slot)
        self.query_ids = np.asarray(qids, dtype=np.int64)
        self.need = np.asarray(needs, dtype=np.int64)
        self._term_slots = {
            t: np.asarray(s, dtype=np.int64) for t, s in term_slots.items()
        }

    @property
    def n_queries(self) -> int:
        return self.query_ids.size

    def match_batch(
        self,
        batch: pa.Table,
        id_column: str = "doc_id",
        text_column: str = "text",
    ) -> pa.Table:
        """(doc_id, query_id) rows for every stored query each doc in
        the batch satisfies. Vectorized: distinct (doc, term) pairs
        from one analyzer pass; only batch-unique terms probe the
        stored-query map; counts fold with one bincount."""
        out_schema = pa.schema(
            [("doc_id", pa.int64()), ("query_id", pa.int64())]
        )
        if self.n_queries == 0 or batch.num_rows == 0:
            return out_schema.empty_table()
        doc_idx, codes, _tf, uniques = doc_term_tf(
            batch, self.cfg, id_column=id_column, text_column=text_column
        )
        if codes.size == 0:
            return out_schema.empty_table()
        # per-unique-term probe of the stored-query map
        uniq = uniques.to_pylist()
        hit_pos = np.full(len(uniq), -1, dtype=np.int64)
        flat_slots: list[np.ndarray] = []
        offsets = [0]
        for ui, term in enumerate(uniq):
            slots = self._term_slots.get(term)
            if slots is None:
                continue
            hit_pos[ui] = len(offsets) - 1
            flat_slots.append(slots)
            offsets.append(offsets[-1] + slots.size)
        if not flat_slots:
            return out_schema.empty_table()
        flat = np.concatenate(flat_slots)
        starts = np.asarray(offsets[:-1], dtype=np.int64)
        lens = np.diff(np.asarray(offsets, dtype=np.int64))
        # expand each matched (doc, term) pair into its query slots
        pos = hit_pos[codes]
        m = pos >= 0
        hd, hp = doc_idx[m], pos[m]
        reps = lens[hp]
        seg = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        exp_slots = flat[np.repeat(starts[hp], reps) + seg]
        exp_docs = np.repeat(hd, reps)
        # (doc, term) pairs are distinct and a term sits at most once in
        # a query's slot list, so counts == distinct matched terms
        key = exp_docs * self.n_queries + exp_slots
        counts = np.bincount(key, minlength=batch.num_rows * self.n_queries)
        hitkeys = np.flatnonzero(
            counts == np.tile(self.need, batch.num_rows)
        )
        if self.criteria and hitkeys.size:
            # metadata criteria: one Arrow kernel chain per stored query
            # per batch -> a doc mask; drop (doc, query) hits failing it
            import pyarrow.compute as pc

            hit_slots = hitkeys % self.n_queries
            hit_rows = hitkeys // self.n_queries
            keep = np.ones(hitkeys.size, dtype=bool)
            for slot, crits in self.criteria.items():
                sel = hit_slots == slot
                if not sel.any():
                    continue
                mask = None
                for col, op, val in crits:
                    m = getattr(pc, self._OPS[op])(batch[col], val)
                    m = pc.fill_null(m, False)
                    mask = m if mask is None else pc.and_(mask, m)
                mask_np = mask.to_numpy(zero_copy_only=False)
                keep[sel] = mask_np[hit_rows[sel]]
            hitkeys = hitkeys[keep]
        ids = (
            batch[id_column]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)[hitkeys // self.n_queries]
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "query_id": pa.array(
                    self.query_ids[hitkeys % self.n_queries], pa.int64()
                ),
            }
        )


def percolate_dataset(
    ds,
    queries: list[tuple[int, str]],
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    analyzer_cfg: AnalyzerConfig = AnalyzerConfig(),
):
    """Stream a document Dataset through the stored-query set →
    (doc_id, query_id) match rows. The compiled index rides the task
    closure (stored-query sets are rule tables, not data tables); the
    doc stream is never shuffled, so this scales linearly with input
    blocks."""
    idx = PercolateIndex(queries, analyzer_cfg)

    def fn(batch: pa.Table) -> pa.Table:
        return idx.match_batch(batch, id_column, text_column)

    return ds.map_batches(fn, batch_format="pyarrow")
