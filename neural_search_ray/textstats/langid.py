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
    preds = [predict_language(t) for t in batch[text_col].to_pylist()]
    return pa.table({id_col: batch[id_col], "pred_lang": pa.array(preds, type=pa.string())})


def langid_stopword_profile(text: str) -> str:
    return predict_language(text)
