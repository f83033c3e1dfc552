"""Cross-doc window-dedup APPLY (textstats/webfilter.py
window_apply_rows_stage / window_keep_bucket_group /
window_rebuild_doc_group)."""

import pyarrow as pa
import pytest
import ray.data

from neural_search_ray.textstats.webfilter import (
    DEDUP_WINDOW_WIDTH,
    window_apply_rows_stage,
    window_keep_bucket_group,
    window_rebuild_doc_group,
)

W = DEDUP_WINDOW_WIDTH  # 3

DOCS = {
    0: "a b c d e f tail1",          # windows: [a b c] [d e f]
    1: "a b c x y z",                # [a b c] dup of doc 0's first
    2: "x y z d e f",                # [x y z] dup of doc 1's, [d e f] dup of 0
    3: "q r",                        # no full window, tail only
    4: "",                           # empty doc
    5: "a b c a b c leftover",       # intra-doc repeat: NOT a dup by itself
}


def _run(docs):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(sorted(docs), pa.int64()),
        "text": pa.array([docs[k] for k in sorted(docs)], pa.string()),
    }))
    out = (
        ds.map_batches(window_apply_rows_stage(), batch_format="pyarrow")
        .groupby("wbucket")
        .map_groups(window_keep_bucket_group, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(window_rebuild_doc_group, batch_format="pyarrow")
    )
    return {r["doc_id"]: r for r in out.take_all()}


def _brute(docs):
    owner = {}
    wins = {}
    for d in sorted(docs):
        toks = docs[d].split()
        ws = [" ".join(toks[i * W:(i + 1) * W]) for i in range(len(toks) // W)]
        wins[d] = (ws, toks[(len(toks) // W) * W:])
        for w in ws:
            owner.setdefault(w, d)
    out = {}
    for d in sorted(docs):
        ws, tail = wins[d]
        kept = [w for w in ws if owner[w] == d]
        out[d] = {
            "new_text": " ".join(kept + ([" ".join(tail)] if tail else [])),
            "n_kept": len(kept),
            "n_dropped": len(ws) - len(kept),
        }
    return out


class TestWindowApply:
    def test_matches_bruteforce(self, ray_session):
        got = _run(DOCS)
        exp = _brute(DOCS)
        assert set(got) == set(exp)
        for d in exp:
            assert got[d]["new_text"] == exp[d]["new_text"], d
            assert got[d]["n_kept"] == exp[d]["n_kept"], d
            assert got[d]["n_dropped"] == exp[d]["n_dropped"], d

    def test_first_occurrence_keeps_everything(self, ray_session):
        got = _run(DOCS)
        # doc 0 is the min doc for both its windows: untouched
        assert got[0]["new_text"] == DOCS[0]
        assert got[0]["n_dropped"] == 0
        # doc 2 loses both windows, keeps nothing (no tail)
        assert got[2]["new_text"] == ""
        assert got[2]["n_kept"] == 0 and got[2]["n_dropped"] == 2

    def test_tail_and_empty_docs_survive(self, ray_session):
        got = _run(DOCS)
        assert got[3]["new_text"] == "q r"
        assert got[3]["n_kept"] == 0 and got[3]["n_dropped"] == 0
        assert got[4]["new_text"] == ""

    def test_intra_doc_repeat_not_dropped(self, ray_session):
        got = _run(DOCS)
        # doc 5 repeats "a b c" twice; the window is owned by doc 0, so
        # BOTH occurrences drop — but a window unique to doc 5 repeated
        # within it would be kept twice
        assert got[5]["n_dropped"] == 2
        solo = _run({7: "m n o m n o end"})
        assert solo[7]["new_text"] == "m n o m n o end"
        assert solo[7]["n_dropped"] == 0
