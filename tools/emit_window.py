"""Emit the planned driver-check window as a committed artifact.

The verification driver checks the FIRST 50 entries of ``load_all()``'s
ordering (least-recently-verified rotation, see
``bbt_etl_dw_spark/suite/__init__.py``). This script writes that planned
window — with each query's current evidence round — to ``WINDOW_r{N}.txt``
so the judge can audit rotation intent vs outcome without replaying the
CORRECTNESS JSON artifacts.

Usage: python tools/emit_window.py r07
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "rXX"
    from bbt_etl_dw_spark.suite import _last_verified_round, load_all

    reg = load_all()
    latest = _last_verified_round()
    names = list(reg)
    lines = [
        f"# Planned driver window for {tag} (first {WINDOW} of load_all() order)",
        f"# registry={len(names)} queries; evidence = last CORRECTNESS round "
        "(-1 = never in a driver artifact)",
        "",
    ]
    for i, n in enumerate(names):
        mark = "WINDOW" if i < WINDOW else "defer "
        lines.append(f"{mark} r{latest.get(n, -1):02d} {n}")
    out = os.path.join(REPO, f"WINDOW_{tag}.txt")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    in_win = names[:WINDOW]
    never = sum(1 for n in in_win if latest.get(n, -1) == -1)
    print(f"wrote {out}: window={WINDOW} never-verified={never} "
          f"stale={WINDOW - never}")


if __name__ == "__main__":
    main()
