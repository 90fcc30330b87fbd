"""Driver-gate parity report (VERDICT r4 next-round #4).

The driver SAMPLES `__spark_entry__.queries()` when writing
CORRECTNESS_r{N}.json, so entries can silently go ungated for a round
(r4: 6 of 56 got no row).  This script makes the gap explicit and
closable in one command:

    python scripts/gate_parity.py           # report gated vs ungated
    python scripts/gate_parity.py --run     # + run the local mirror
                                            #   (scripts/check_oracles.py
                                            #   at sf0.01) on every
                                            #   ungated entry

Exit status: 0 when every queries() entry is either gated in the
latest CORRECTNESS_r*.json or (with --run) locally mirror-verified;
1 otherwise.  The round's README quotes this report so the judge can
see exactly which entries rode the driver gate and which rode the
mirror.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def latest_correctness() -> tuple[str, dict]:
    files = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    if not files:
        return "(none)", {}
    def rnum(p: str) -> int:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1
    best = max(files, key=rnum)
    with open(best) as f:
        return os.path.basename(best), json.load(f)


def main() -> int:
    import __spark_entry__ as entry

    declared = sorted(entry.queries())
    fname, gate = latest_correctness()
    gated_ok = sorted(
        n for n in declared
        if n in gate and gate[n].get("hash_match") and gate[n].get("rows_match")
    )
    gated_bad = sorted(
        n for n in declared
        if n in gate and not (gate[n].get("hash_match") and gate[n].get("rows_match"))
    )
    ungated = sorted(n for n in declared if n not in gate)

    print(f"declared queries : {len(declared)}")
    print(f"latest gate file : {fname}")
    print(f"gated green      : {len(gated_ok)}")
    if gated_bad:
        print(f"gated FAILING    : {len(gated_bad)} -> {gated_bad}")
    print(f"ungated          : {len(ungated)}" +
          (f" -> {ungated}" if ungated else ""))

    if gated_bad:
        return 1
    if not ungated:
        print("parity: every declared query has a green driver-gate row")
        return 0
    if "--run" not in sys.argv:
        print("parity: ungated entries present — rerun with --run to "
              "mirror-verify them locally")
        return 1
    print(f"\nrunning local mirror (check_oracles.py sf0.01) on {len(ungated)} "
          "ungated entries...")
    rc = subprocess.call(
        [sys.executable, os.path.join(REPO, "scripts", "check_oracles.py"),
         "/root/testdata/sf0.01", *ungated]
    )
    if rc == 0:
        print("parity: ungated entries locally mirror-verified "
              f"({len(gated_ok)} driver-gated + {len(ungated)} mirrored "
              f"= {len(declared)} total green)")
    return rc


if __name__ == "__main__":
    sys.exit(main())
