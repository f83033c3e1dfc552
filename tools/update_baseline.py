"""Record bench/scaling results into BASELINE.md.

Usage:
  PYTHONPATH=. python tools/update_baseline.py '<scaling-json-line>'
or pipe: python bench.py --scaling | PYTHONPATH=. python tools/update_baseline.py
"""

from __future__ import annotations

import datetime
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARK_BEGIN = "<!-- MEASURED-RESULTS:BEGIN -->"
MARK_END = "<!-- MEASURED-RESULTS:END -->"


def render(d: dict) -> str:
    today = datetime.date.today().isoformat()
    eff = d["scaling_efficiency"]
    verdict = "PASS" if eff >= d.get("target", 0.8) else "FAIL"
    return f"""{MARK_BEGIN}
## Measured results ({today}, single node, fresh process per run, best-of-N)

corpus: synthetic Common-Crawl-style pages, seed=42, {d.get('n_pages', 4_000_000):,} docs

| run | cpus | build docs/sec | query p50 ms | query p99 ms |
|---|---|---|---|---|
| A | {d['cpus_low']} | {d['build_docs_per_sec_low']:,.0f} | {d['query_p50_ms_low']} | {d['query_p99_ms_low']} |
| B | {d['cpus_high']} | {d['build_docs_per_sec_high']:,.0f} | {d['query_p50_ms_high']} | {d['query_p99_ms_high']} |

scaling efficiency (A→B, {d['cpus_low']}→{d['cpus_high']} cpus): **{eff}**
(target ≥ {d.get('target', 0.8)}) → **{verdict}**

rank-identity vs oracle: enforced by pytest
(tests/test_index_query.py::test_bm25_rank_identity,
tests/test_engine_advanced.py::test_multi_segment_rank_identity) and by
the DuckDB oracle gate (tools/check_correctness.py — bm25_topk et al.).
{MARK_END}"""


def main() -> None:
    raw = sys.argv[1] if len(sys.argv) > 1 else sys.stdin.read()
    line = [l for l in raw.strip().splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    path = os.path.join(REPO, "BASELINE.md")
    text = open(path).read()
    block = render(d)
    if MARK_BEGIN in text:
        text = re.sub(
            re.escape(MARK_BEGIN) + r".*?" + re.escape(MARK_END),
            block,
            text,
            flags=re.S,
        )
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    open(path, "w").write(text)
    print(f"BASELINE.md updated: efficiency={d['scaling_efficiency']}")


if __name__ == "__main__":
    main()
