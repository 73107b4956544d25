"""Round-9 scale soak: the r8 surfaces one decade further (VERDICT r8
task 6). Round 8 proved Δ-seeded appends and DRed deletes ~flat on the
20k→200k store decade; this reruns the SAME protocols on 200k→2M so the
claim stands on two decades, not one. Reuses the r8 soak bodies verbatim
— only the store sizes change.

Prints one JSON line per (protocol, ruleset) for PERFORMANCE.md.

Usage: python tools/r9_soak.py [append|dred]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

SIZES = (200_000, 2_000_000)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("append", "both"):
        from r8_soak import soak as append_soak

        for ruleset in ("owl-horst", "owl2-rl"):
            out = append_soak(ruleset, sizes=SIZES)
            out["protocol"] = "delta_seeded_append"
            print(json.dumps(out), flush=True)
    if which in ("dred", "both"):
        from r8b_soak import soak as dred_soak

        for ruleset in ("rdfsplus", "owl-horst", "owl2-rl"):
            out = dred_soak(ruleset, sizes=SIZES)
            out["protocol"] = "dred_delete"
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
