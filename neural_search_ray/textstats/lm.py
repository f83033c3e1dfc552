"""Unigram language-model perplexity scoring (CCNet-style quality
signal).

Large-scale curation pipelines (CCNet, Wenzek et al. 2020; Gopher /
RefinedWeb reuse the recipe) rank web documents by LM perplexity and
drop the tail. The full recipe uses a KenLM n-gram model; the container
has no model weights, so this module implements the same *pipeline
shape* with a corpus-fit UNIGRAM model — exactly reproducible, fully
SQL-oracleable, and the seam where a KenLM scorer would slot in (the
per-batch scoring signature is identical).

Ray-Data-native two-pass shape (the only shape that scales):

1. **Fit**: one streaming pass — per-batch Arrow value_counts combiners
   (vocabulary-bounded payloads), one groupby-sum, collected to a
   (term → ln p) table ONCE and broadcast via ``ray.put`` (read by
   every scoring task, never re-shipped per batch).
2. **Score**: ``map_batches`` — per doc,
   ``nll = −Σ_t tf_t · ln(cf_t / total_tokens) / dl`` (mean token
   negative log-likelihood; perplexity = exp(nll), monotone in it).
   Fully vectorized: Arrow-C++ tokenization (analysis/analyzer.py
   analyze_column fast path), a C hash-index token→id lookup, and
   per-(doc, term) segmented reduction — no per-row Python loop.
   Unseen terms can't occur when scoring the fitting corpus; a
   held-out scorer applies a min-prob floor over the fitted vocab.

Deterministic accumulation: per doc, unique terms reduce in
term-ascending order (the vocab is term-sorted) via numpy's pairwise
reduction — identical across runs/workers; the round-6 output absorbs
the ≤1-ulp difference vs a sequential sum (same per-(doc, term)
grouping as the SQL oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..analysis.analyzer import analyze_column

__all__ = ["fit_unigram_lm", "nll_score_stage", "lm_nll_dataset"]


def fit_unigram_lm(ds: "ray.data.Dataset", text_col: str = "text"):
    """One streaming pass → (term-sorted vocab dict term→index, aligned
    ln-prob array, total_tokens). The groupby payload is (term, count)
    — bounded by vocabulary, not corpus size."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        lists = analyze_column(batch[text_col].combine_chunks())
        vc = pc.value_counts(lists.flatten())
        return pa.table(
            {
                "term": vc.field("values"),
                "cf": vc.field("counts").cast(pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cf", alias_name="cf"))
        .take_all()
    )
    rows.sort(key=lambda r: r["term"])
    vocab = {r["term"]: i for i, r in enumerate(rows)}
    cf = np.asarray([r["cf"] for r in rows], dtype=np.float64)
    total = float(cf.sum())
    return vocab, np.log(cf / total), total


def nll_score_stage(vocab_ref, lnp_ref, *, smooth_unseen: bool = False):
    """Per-batch scorer: adds ``nll`` (mean token −ln p) and ``n_tokens``
    columns. ``vocab_ref``/``lnp_ref`` are ``ray.put`` handles (or plain
    objects for local use) — broadcast once, shared by every task."""
    import pandas as pd

    state: dict = {}

    def fn(batch: pa.Table) -> pa.Table:
        if "idx" not in state:
            vocab = (
                ray.get(vocab_ref)
                if isinstance(vocab_ref, ray.ObjectRef)
                else vocab_ref
            )
            lnp = np.asarray(
                ray.get(lnp_ref)
                if isinstance(lnp_ref, ray.ObjectRef)
                else lnp_ref,
                dtype=np.float64,
            )
            state["idx"] = pd.Index(list(vocab))
            # OOV bucket at position V: a min-prob floor (held-out path)
            state["lnp"] = np.concatenate(
                [lnp, [float(lnp.min() - np.log(2.0))]]
            )
        index: "pd.Index" = state["idx"]
        lnp_ext = state["lnp"]
        v = index.size

        lists = analyze_column(batch["text"].combine_chunks())
        off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]
        ntok = np.diff(off)
        n = len(batch)
        flat = lists.flatten().to_numpy(zero_copy_only=False)
        nll = np.zeros(n, dtype=np.float64)
        if flat.size:
            vid = index.get_indexer(flat)
            if not smooth_unseen and (vid < 0).any():
                bad = flat[vid < 0][0]
                raise KeyError(f"OOV term {bad!r} without smoothing")
            vid = np.where(vid < 0, v, vid).astype(np.int64)
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), ntok)
            # per-(doc, term) tf via unique on a composite key; keys are
            # sorted, so reduceat accumulates term-ascending within doc —
            # matching the documented deterministic order
            key = doc_idx * np.int64(v + 1) + vid
            uk, counts = np.unique(key, return_counts=True)
            contrib = counts.astype(np.float64) * lnp_ext[uk % (v + 1)]
            doc_of = uk // (v + 1)
            bounds = np.flatnonzero(
                np.r_[True, doc_of[1:] != doc_of[:-1]]
            )
            sums = np.add.reduceat(contrib, bounds)
            present = doc_of[bounds]
            nll[present] = -sums / ntok[present]
        return batch.append_column(
            "n_tokens", pa.array(ntok, pa.int64())
        ).append_column("nll", pa.array(nll, pa.float64()))

    return fn


def lm_nll_dataset(
    ds: "ray.data.Dataset", text_col: str = "text"
) -> "ray.data.Dataset":
    """Fit + score over the same corpus (the oracle path): returns the
    input with ``n_tokens`` and ``nll`` columns appended."""
    vocab, lnp, _ = fit_unigram_lm(ds, text_col)
    vocab_ref = ray.put(vocab)
    lnp_ref = ray.put(lnp)
    return ds.map_batches(
        nll_score_stage(vocab_ref, lnp_ref), batch_format="pyarrow"
    )


# --------------------------------------------------------------------------
# bigram tier: P(t_i | t_{i-1}) = c(prev, t) / c_ctx(prev), first token
# scored by the unigram. Pure MLE — every bigram of the fitting corpus
# was counted, so scoring that corpus never sees an unseen pair (the
# held-out path applies the floor).

_SEP = "\x1f"  # unit separator: cannot appear inside analyzer tokens


def _flat_tokens(batch: pa.Table, text_col: str):
    """(flat token np array, per-doc lengths) via the Arrow fast path."""
    lists = analyze_column(batch[text_col].combine_chunks())
    off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    off = off - off[0]
    return lists.flatten().to_numpy(zero_copy_only=False), np.diff(off)


def _bigram_keys(flat: np.ndarray, ntok: np.ndarray) -> np.ndarray:
    """Within-doc adjacent pairs as 'prev\\x1fcur' strings (vectorized
    object-array concat; pairs never cross doc boundaries)."""
    if flat.size == 0:
        return np.empty(0, dtype=object)
    n = ntok.size
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), ntok)
    same = doc_idx[1:] == doc_idx[:-1]
    prev = flat[:-1][same]
    cur = flat[1:][same]
    return np.char.add(
        np.char.add(prev.astype("U"), _SEP), cur.astype("U")
    ).astype(object)


def fit_bigram_lm(ds: "ray.data.Dataset", text_col: str = "text"):
    """Two streaming passes (unigram + bigram), both vocabulary-bounded:
    returns a model dict {"uni": (vocab, lnp), "bi": (pair-key dict,
    ln(c_bi/c_ctx) array)} for broadcast."""
    from ray.data.aggregate import Sum

    uni_vocab, uni_lnp, _ = fit_unigram_lm(ds, text_col)

    def partial(batch: pa.Table) -> pa.Table:
        flat, ntok = _flat_tokens(batch, text_col)
        keys = _bigram_keys(flat, ntok)
        u, c = np.unique(keys, return_counts=True)
        return pa.table(
            {
                "pair": pa.array(u, pa.string()),
                "c": pa.array(c, pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )
    rows.sort(key=lambda r: r["pair"])
    ctx: dict[str, int] = {}
    for r in rows:
        prev = r["pair"].split(_SEP, 1)[0]
        ctx[prev] = ctx.get(prev, 0) + r["c"]
    pair_vocab = {r["pair"]: i for i, r in enumerate(rows)}
    ln_bi = np.asarray(
        [
            np.log(r["c"] / float(ctx[r["pair"].split(_SEP, 1)[0]]))
            for r in rows
        ],
        dtype=np.float64,
    )
    return {"uni": (uni_vocab, uni_lnp), "bi": (pair_vocab, ln_bi)}


def bigram_nll_stage(model_ref, *, smooth_unseen: bool = False):
    """Per-batch bigram scorer: nll = −(ln P_uni(t₀) +
    Σ ln P(tᵢ|tᵢ₋₁)) / n_tokens. Vectorized: one hash-index lookup for
    first-token unigrams, one for bigram pairs, one segmented reduce."""
    import pandas as pd

    state: dict = {}

    def fn(batch: pa.Table) -> pa.Table:
        if "uni_idx" not in state:
            model = (
                ray.get(model_ref)
                if isinstance(model_ref, ray.ObjectRef)
                else model_ref
            )
            uv, ul = model["uni"]
            bv, bl = model["bi"]
            state["uni_idx"] = pd.Index(list(uv))
            state["uni_lnp"] = np.concatenate(
                [ul, [float(ul.min() - np.log(2.0))]]
            )
            state["bi_idx"] = pd.Index(list(bv))
            fl = float(bl.min() - np.log(2.0)) if bl.size else 0.0
            state["bi_lnp"] = np.concatenate([bl, [fl]])
        n = len(batch)
        flat, ntok = _flat_tokens(batch, "text")
        nll = np.zeros(n, dtype=np.float64)
        if flat.size:
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), ntok)
            contrib = np.zeros(flat.size, dtype=np.float64)
            first = np.flatnonzero(
                np.r_[True, doc_idx[1:] != doc_idx[:-1]]
            )
            uvid = state["uni_idx"].get_indexer(flat[first])
            bkeys = _bigram_keys(flat, ntok)
            bvid = state["bi_idx"].get_indexer(bkeys)
            if not smooth_unseen and (
                (uvid < 0).any() or (bvid < 0).any()
            ):
                raise KeyError("unseen token/bigram without smoothing")
            uvid = np.where(uvid < 0, len(state["uni_idx"]), uvid)
            bvid = np.where(bvid < 0, len(state["bi_idx"]), bvid)
            contrib[first] = state["uni_lnp"][uvid]
            rest = np.setdiff1d(
                np.arange(flat.size, dtype=np.int64), first,
                assume_unique=True,
            )
            contrib[rest] = state["bi_lnp"][bvid]
            sums = np.add.reduceat(contrib, first)
            present = doc_idx[first]
            nll[present] = -sums / ntok[present]
        return batch.append_column(
            "n_tokens", pa.array(ntok, pa.int64())
        ).append_column("nll", pa.array(nll, pa.float64()))

    return fn


def lm_bigram_nll_dataset(
    ds: "ray.data.Dataset", text_col: str = "text"
) -> "ray.data.Dataset":
    """Bigram fit + score over the same corpus (the oracle path)."""
    model_ref = ray.put(fit_bigram_lm(ds, text_col))
    return ds.map_batches(
        bigram_nll_stage(model_ref), batch_format="pyarrow"
    )
