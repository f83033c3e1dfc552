"""Language identification by stopword-profile scoring (deterministic,
SQL-expressible heuristic).

score(lang) = number of tokens present in that language's function-word
list; predicted language = argmax, ties broken by language code asc,
'und' when all scores are 0.
"""

from __future__ import annotations

import pyarrow as pa

from ..analysis.analyzer import tokenize

LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the a an and of to in is it that for on with as at by this be are was".split()
    ),
    "es": frozenset(
        "el la los las de que y en un una es por con para no se su al lo".split()
    ),
    "de": frozenset(
        "der die das und ist von zu mit den im für auf ein eine nicht sich".split()
    ),
    "fr": frozenset(
        "le la les de et que en un une est pour dans qui au du pas sur ce".split()
    ),
}


def predict_language(text: str) -> str:
    toks = tokenize(text or "")
    best_lang, best_score = "und", 0
    for lang in sorted(LANG_PROFILES):
        score = sum(1 for t in toks if t in LANG_PROFILES[lang])
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def langid_stage(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Batch-vectorized: one analyze_column pass, profile membership
    tested once per UNIQUE batch term, per-doc scores by scatter-add —
    matches predict_language exactly (argmax with strict >, ties → first
    language in sorted order, all-zero → 'und')."""
    import numpy as np

    from ..stages.tfvec import doc_term_tf

    n = batch.num_rows
    doc_idx, codes, tfs, uniques = doc_term_tf(
        batch, id_column=id_col, text_column=text_col
    )
    langs = sorted(LANG_PROFILES)
    scores = np.zeros((n, len(langs)), dtype=np.int64)
    if codes.size:
        uniq_list = uniques.to_pylist()
        for j, lang in enumerate(langs):
            prof = LANG_PROFILES[lang]
            in_prof = np.fromiter(
                (u in prof for u in uniq_list), dtype=bool, count=len(uniq_list)
            )
            mask = in_prof[codes]
            np.add.at(scores[:, j], doc_idx[mask], tfs[mask])
    mx = scores.max(axis=1) if n else np.zeros(0, np.int64)
    am = scores.argmax(axis=1) if n else np.zeros(0, np.int64)
    lang_arr = np.asarray(langs, dtype=object)
    preds = np.where(mx > 0, lang_arr[am], "und")
    return pa.table(
        {id_col: batch[id_col], "pred_lang": pa.array(list(preds), type=pa.string())}
    )


def langid_stopword_profile(text: str) -> str:
    return predict_language(text)
