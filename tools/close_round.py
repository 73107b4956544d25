"""Round-close artifact gate (VERDICT r5 task 2).

Round 5 shipped a stale sf1 gate artifact (generated 40 minutes before
the last engine fix) and a stale SURVEY registry count. This tool makes
that impossible to repeat silently:

1. re-runs ``check_oracle.py --json`` over the FULL registry at sf0.01
   (→ ``LOCALGATE_r{N}.json``) and, when the scaled data exists, at sf1
   (→ ``LOCALGATE_r{N}_sf1.json``);
2. asserts the LAST "Registry now: X queries() entries, Y with SQL
   oracles." line in SURVEY.md matches the live registry;
3. refuses if any engine-tree commit is NEWER than the artifacts it just
   wrote (you committed engine code mid-run — rerun the tool);
4. stamps a ``_meta`` record into each artifact: round number, registry
   counts, engine HEAD, and the round's sf0.01 default-suite rotation
   cohort (VERDICT r5 task 3 — see tests/test_harness_oracle.py).

Usage::

    python tools/close_round.py <round> [--skip-sf1]
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SF001 = "/root/testdata/sf0.01"
SF1 = str(ROOT / ".scaledata" / "sf1")

sys.path.insert(0, str(ROOT))


def rotation_cohort(round_no: int, names: list[str], size: int = 20) -> list[str]:
    """Deterministic ~``size``-entry cohort for a round: the sorted
    registry striped into ceil(N/size) groups, group index = round mod
    group count — every entry lands in the default-suite sf0.01 sweep
    within ~N/size rounds."""
    n_groups = max(1, -(-len(names) // size))
    return [n for i, n in enumerate(sorted(names)) if i % n_groups == round_no % n_groups]


def engine_head_epoch() -> tuple[str, int]:
    """(commit, unix time) of the newest commit touching the engine tree."""
    out = subprocess.run(
        ["git", "log", "-1", "--format=%H %ct", "--",
         "dublin_smart_city_graphdb_spark", "tools", "__spark_entry__.py"],
        cwd=ROOT, capture_output=True, text=True, check=True,
    ).stdout.split()
    return out[0], int(out[1])


def survey_counts() -> tuple[int, int]:
    text = (ROOT / "SURVEY.md").read_text()
    matches = re.findall(
        r"Registry now:\s+(\d+)\s+queries\(\)\s+entries,\s*(\d+)\s+with\s+SQL", text
    )
    if not matches:
        raise SystemExit("close_round: no 'Registry now:' line in SURVEY.md")
    q, o = matches[-1]
    return int(q), int(o)


def run_gate(sf_dir: str, json_path: Path) -> bool:
    print(f"== close_round: full-registry gate at {sf_dir} -> {json_path.name}")
    proc = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "check_oracle.py"),
         "--json", str(json_path), sf_dir],
        cwd=ROOT,
    )
    return proc.returncode == 0


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skip_sf1 = "--skip-sf1" in sys.argv
    if not args:
        raise SystemExit("usage: python tools/close_round.py <round> [--skip-sf1]")
    round_no = int(args[0])

    from dublin_smart_city_graphdb_spark import harness

    names = sorted(harness.REGISTRY)
    n_oracles = sum(1 for n in names if harness.REGISTRY[n].oracle)
    sq, so = survey_counts()
    if (sq, so) != (len(names), n_oracles):
        print(f"FAIL: SURVEY.md says {sq}/{so} but the registry has "
              f"{len(names)}/{n_oracles} — update the 'Registry now:' line")
        return 1
    print(f"registry counts OK: {len(names)} entries, {n_oracles} oracles")

    head_before, _ = engine_head_epoch()
    cohort = rotation_cohort(round_no, names)
    targets = [(SF001, ROOT / f"LOCALGATE_r{round_no}.json")]
    if not skip_sf1:
        if Path(SF1).is_dir():
            targets.append((SF1, ROOT / f"LOCALGATE_r{round_no}_sf1.json"))
        else:
            print(f"note: {SF1} missing — run tools/gen_scale.py first "
                  "(continuing with sf0.01 only)")

    ok = True
    for sf_dir, path in targets:
        if not run_gate(sf_dir, path):
            ok = False
        records = json.loads(path.read_text())
        records["_meta"] = {
            "round": round_no,
            "sf_dir": sf_dir,
            "generated_unix": int(time.time()),
            "engine_head": head_before,
            "registry_entries": len(names),
            "registry_oracles": n_oracles,
            "rotation_cohort": cohort,
        }
        path.write_text(json.dumps(records, indent=2))

    # VERDICT r10 #1: refuse to close while the AUDITED roster has names
    # with no section in the committed PLANS.md (regenerate it first).
    from tools.audit_plans import plans_md_drift

    drift = plans_md_drift(ROOT / "PLANS.md")
    if drift:
        print("FAIL: PLANS.md lacks AUDITED sections for: "
              + ", ".join(drift) + " — run tools/audit_plans.py and commit")
        return 1

    head_after, head_time = engine_head_epoch()
    if head_after != head_before:
        print(f"FAIL: engine tree advanced mid-run ({head_before[:9]} -> "
              f"{head_after[:9]}) — the artifacts are already stale; rerun")
        return 1
    for _, path in targets:
        if path.stat().st_mtime < head_time:
            print(f"FAIL: {path.name} is older than the newest engine "
                  "commit — rerun close_round after the last engine commit")
            return 1
    if not ok:
        print("FAIL: at least one gate query diverged — see output above")
        return 1
    print(f"close_round r{round_no}: all artifacts fresh and green; "
          f"rotation cohort ({len(cohort)}): {', '.join(cohort[:5])}…")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
