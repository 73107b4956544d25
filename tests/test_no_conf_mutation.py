"""Guard: no harness/operator code mutates session confs at call time.

VERDICT r3 task 3: a query function that calls ``spark.conf.set`` makes
every later query in the same session see different state than an earlier
one — exactly the order-dependence that made the r3 ``q12_late_lines``
driver-vs-local divergence undiagnosable. The only sanctioned runtime
mutation is ``session.enable_nanos_compat_if_needed`` (footer-gated: it
fires only for parquet files Spark cannot read any other way, and the flag
is a no-op for files without NANOS columns). Everything else must configure
at session build time (session.py get_spark) or set/restore locally with an
explicit allowlist entry here.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "dublin_smart_city_graphdb_spark"

# file (relative to package) -> set of line-contexts allowed to conf.set
ALLOWED = {
    # the single sanctioned runtime enable, footer-gated
    "session.py": {"spark.sql.legacy.parquet.nanosAsLong"},
}

CONF_SET = re.compile(r"\.conf\.set\(")


def test_no_runtime_conf_mutation():
    offenders = []
    for py in sorted(PKG.rglob("*.py")):
        rel = str(py.relative_to(PKG))
        text = py.read_text()
        for i, line in enumerate(text.splitlines(), 1):
            if CONF_SET.search(line):
                allowed_keys = ALLOWED.get(rel, set())
                window = "\n".join(text.splitlines()[max(0, i - 3): i + 1])
                if not any(k in window for k in allowed_keys):
                    offenders.append(f"{rel}:{i}: {line.strip()}")
    assert offenders == [], (
        "runtime session-conf mutation outside the allowlist:\n"
        + "\n".join(offenders)
    )
