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

1. **Fit**: one streaming pass — per-batch (term, count) combiners, one
   groupby-sum bounded by vocabulary, collected to a (term → ln p)
   table ONCE and broadcast via ``ray.put`` (read by every scoring
   task, never re-shipped per batch).
2. **Score**: ``map_batches`` — per doc,
   ``nll = −Σ_t tf_t · ln(cf_t / total_tokens) / dl`` (mean token
   negative log-likelihood; perplexity = exp(nll), monotone in it).
   Unseen terms can't occur when scoring the fitting corpus; a held-out
   scorer applies add-one smoothing over the fitted vocab.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..analysis.analyzer import tokenize

__all__ = ["fit_unigram_lm", "nll_score_stage", "lm_nll_dataset"]


def fit_unigram_lm(ds: "ray.data.Dataset", text_col: str = "text"):
    """One streaming pass → (vocab dict term→index, ln-prob array,
    total_tokens). The groupby payload is (term, count) — bounded by
    vocabulary, not corpus size."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        terms: dict[str, int] = {}
        for txt in batch[text_col].to_pylist():
            for t in tokenize(txt):
                terms[t] = terms.get(t, 0) + 1
        return pa.table(
            {
                "term": pa.array(list(terms.keys()), pa.string()),
                "cf": pa.array(list(terms.values()), pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cf", alias_name="cf"))
        .take_all()
    )
    vocab = {r["term"]: i for i, r in enumerate(rows)}
    cf = np.asarray([r["cf"] for r in rows], dtype=np.float64)
    total = float(cf.sum())
    return vocab, np.log(cf / total), total


def nll_score_stage(vocab_ref, lnp_ref, *, smooth_unseen: bool = False):
    """Per-batch scorer: adds ``nll`` (mean token −ln p) and ``n_tokens``
    columns. ``vocab_ref``/``lnp_ref`` are ``ray.put`` handles (or plain
    objects for local use) — broadcast once, shared by every task.

    Deterministic accumulation: per doc, unique terms in SORTED order,
    Σ tf·ln p — the same grouping the SQL oracle's per-(doc, term) sum
    uses."""

    def fn(batch: pa.Table) -> pa.Table:
        vocab = (
            ray.get(vocab_ref)
            if isinstance(vocab_ref, ray.ObjectRef)
            else vocab_ref
        )
        lnp = (
            ray.get(lnp_ref)
            if isinstance(lnp_ref, ray.ObjectRef)
            else lnp_ref
        )
        # add-one floor for held-out corpora (never hit when scoring
        # the fitting corpus itself)
        floor = float(lnp.min() - np.log(2.0)) if smooth_unseen else None
        nlls, ntoks = [], []
        for txt in batch["text"].to_pylist():
            toks = tokenize(txt)
            if not toks:
                nlls.append(0.0)
                ntoks.append(0)
                continue
            counts: dict[str, int] = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            acc = 0.0
            for t in sorted(counts):
                i = vocab.get(t)
                if i is None:
                    if floor is None:
                        raise KeyError(f"OOV term {t!r} without smoothing")
                    acc += counts[t] * floor
                else:
                    acc += counts[t] * float(lnp[i])
            nlls.append(-acc / len(toks))
            ntoks.append(len(toks))
        return batch.append_column(
            "n_tokens", pa.array(ntoks, pa.int64())
        ).append_column("nll", pa.array(nlls, pa.float64()))

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
