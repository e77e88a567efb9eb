"""Driver-window rotation planner: computes the NEXT round's
_DRIVER_FIRST list from the actual CORRECTNESS_r*.json files, so the
promotion recipe in plans/__init__.py is executed mechanically instead
of re-derived by hand each round.

Policy (the rotation contract tests/test_parity.py enforces):
  1. every registry query with NO hash-green driver row, in current
     registry order (the declared queue order), fills the window first;
  2. staged queries (plans/staging.py) are listed for promotion
     (stage() -> register()) and take the slots after the registry
     backlog — the planner prints them separately because promotion is
     a code edit, not a reorder;
  3. remaining window slots refill with the STALEST greens (oldest
     round of their last hash-green row) — beyond-window rot is where
     round 4's regression hid;
  4. overflow (never-checked beyond 50) must stay under 25 and is
     printed as the declared next-window queue.

Usage: python scripts/plan_rotation.py [window_size]
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    from pse_stocks_etl_spark import plans
    from pse_stocks_etl_spark.plans.staging import STAGING

    last_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        for name, rec in json.load(open(path)).items():
            if rec.get("hash_match") is True:
                last_green[name] = max(last_green.get(name, 0), rnd)

    names = list(plans.REGISTRY)
    never = [n for n in names if n not in last_green]
    stale = sorted(
        (n for n in names if n in last_green), key=lambda n: (last_green[n], n)
    )
    staged = list(STAGING)

    head = never + staged
    refill = [n for n in stale if n not in head][: max(0, window - len(head))]
    plan = head + refill
    print(f"# window={window}; never-checked registry={len(never)}; "
          f"staged-to-promote={len(staged)}; stale refill={len(refill)}")
    print("# -- promote these from plans/staging.py (stage -> register):")
    for n in staged:
        print(f"#    {n}")
    print("_DRIVER_FIRST = [")
    for n in plan[:window]:
        print(f'    "{n}",')
    overflow = plan[window:]
    if overflow:
        print(f"    # -- declared next-window queue ({len(overflow)} / bound 25):")
        for n in overflow:
            print(f'    "{n}",')
    print("]")
    if len(overflow) > 25:
        print(f"# WARNING: overflow {len(overflow)} exceeds the 25-query bound")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
