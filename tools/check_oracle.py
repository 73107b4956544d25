"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and order-insensitive values. Usage::

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path
from typing import NamedTuple

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            # Spark-written table: a DIRECTORY of part files (the sf1
            # scale-soak dirs from tools/gen_scale.py)
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (int, str)):
        return str(v)
    # timestamps, decimals, bytes, lists
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def _bound_unique_users(s_cols, s_rows, con) -> tuple[bool, str]:
    """HLL++ error bound vs DuckDB's exact distinct counts: every
    (hour, type) group within max(2, 10% of exact) — the bound
    tests/test_quantiles_approx.py pins, absolute slack for quantized
    tiny groups."""
    exact = {
        (r[0], r[1]): r[2]
        for r in con.sql(
            "SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 "
            "AS hour_idx, event_type, COUNT(DISTINCT user_id) "
            "FROM events GROUP BY 1, 2"
        ).fetchall()
    }
    idx = {c: i for i, c in enumerate(s_cols)}
    worst = 0.0
    for r in s_rows:
        ex = exact[(r[idx["hour_idx"]], r[idx["event_type"]])]
        diff = abs(r[idx["unique_users"]] - ex)
        # the bound tests/test_quantiles_approx.py pins, with the
        # absolute slack at 2 counts (tiny sf0.01 groups quantize: a
        # 4-distinct group is 25% off at diff 1)
        worst = max(worst, diff / max(2.0, 0.10 * ex))
    return worst <= 1.0, (
        f"max HLL error {worst:.3f} of the max(2, 10%*exact) budget"
    )


def _bound_quantiles(s_cols, s_rows, con) -> tuple[bool, str]:
    """GK-sketch rank-error bound vs DuckDB: the empirical rank of every
    approx percentile value stays within 2% of its target rank (the same
    bound tests/test_quantiles_approx.py pins)."""
    idx = {c: i for i, c in enumerate(s_cols)}
    worst = 0.0
    for r in s_rows:
        et = str(r[idx["event_type"]]).replace("'", "''")
        for p, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            v = r[idx[col]]
            rank = con.sql(
                f"SELECT AVG(CASE WHEN value <= {v} THEN 1.0 ELSE 0.0 END) "
                f"FROM events WHERE event_type = '{et}'"
            ).fetchone()[0]
            worst = max(worst, abs(float(rank) - p))
    return worst <= 0.02, f"max empirical rank error {worst:.4f} <= 0.02"


#: rows-only registry entries whose accuracy bound is re-proved against
#: DuckDB at gate time and stamped into the artifact (VERDICT r6 task 8)
APPROX_BOUNDS = {
    "events_unique_users_approx": _bound_unique_users,
    "events_quantiles_approx": _bound_quantiles,
}


class CompareResult(NamedTuple):
    """Result of one Spark-vs-oracle comparison.

    A NamedTuple so call sites use attribute access (``res.ok``) — adding a
    field can no longer silently break tuple unpacking (the round-5 arity
    regression).
    """

    ok: bool
    msg: str
    dt: float
    rec: dict


def compare(
    name: str, spark, con, sf_dir: str, fn, sql: str | None
) -> CompareResult:
    t0 = time.time()
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    dt = time.time() - t0
    rec = {
        "rows_match": None, "schema_match": None, "hash_match": None,
        "spark_rows": len(s_rows), "oracle_rows": None, "err": None,
    }
    if sql is None:
        rec["err"] = "rows-only (no oracle)"
        checker = APPROX_BOUNDS.get(name)
        if checker:
            bound_ok, detail = checker(s_cols, s_rows, con)
            rec["bound_ok"] = bound_ok
            rec["bound_detail"] = detail
            return CompareResult(
                bound_ok,
                f"rows-only ({len(s_rows)} rows), bound "
                f"{'OK' if bound_ok else 'VIOLATED'}: {detail}",
                time.time() - t0, rec,
            )
        return CompareResult(True, f"rows-only ({len(s_rows)} rows)", dt, rec)
    d = con.sql(sql)
    d_cols = d.columns
    d_rows = d.fetchall()
    rec["oracle_rows"] = len(d_rows)
    rec["schema_match"] = sorted(c.lower() for c in s_cols) == sorted(
        c.lower() for c in d_cols
    )
    if not rec["schema_match"]:
        return CompareResult(False, f"column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}", dt, rec)
    rec["rows_match"] = len(s_rows) == len(d_rows)
    if not rec["rows_match"]:
        return CompareResult(False, f"row count spark={len(s_rows)} duck={len(d_rows)}", dt, rec)
    _, sn = _norm_rows([c.lower() for c in s_cols], s_rows)
    _, dn = _norm_rows([c.lower() for c in d_cols], d_rows)
    rec["hash_match"] = sn == dn
    if not rec["hash_match"]:
        diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        return CompareResult(False, f"value mismatch, first diffs: {diff}", dt, rec)
    return CompareResult(True, f"match ({len(s_rows)} rows)", dt, rec)


def main() -> int:
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    if vanilla:
        args.remove("--vanilla")
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from dublin_smart_city_graphdb_spark import harness

    if vanilla:
        # Replicate the DRIVER's conditions: a bare SparkSession without any
        # of session.py's confs (no UTC pin, no Arrow, no AQE tuning) — the
        # r3 q12 driver-red row did not reproduce under our tuned session,
        # so the gate must also be green under an untuned one.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("oracle-check-vanilla")
            .master("local[8]")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.driver.memory", "12g")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from dublin_smart_city_graphdb_spark.session import get_spark

        spark = get_spark(app_name="oracle-check")
    con = duck_connection(sf_dir)
    failures = []
    attempted = 0
    records: dict[str, dict] = {}
    for name, q in harness.REGISTRY.items():
        if only and name not in only:
            continue
        attempted += 1
        try:
            ok, msg, dt, rec = compare(name, spark, con, sf_dir, q.fn, q.oracle)
        except Exception as ex:  # noqa: BLE001
            ok, msg, dt = False, f"EXCEPTION {type(ex).__name__}: {ex}", 0.0
            rec = {
                "rows_match": False, "schema_match": None,
                "hash_match": None, "spark_rows": None, "oracle_rows": None,
                "err": f"{type(ex).__name__}: {ex}",
            }
        records[name] = rec
        status = "OK " if ok else "FAIL"
        print(f"[{status}] {name:32s} {dt:6.2f}s  {msg}", flush=True)
        if not ok:
            failures.append(name)
    print(f"\n{attempted - len(failures)}/{attempted} passed")
    if json_path:
        import json as _json

        with open(json_path, "w") as f:
            _json.dump(records, f, indent=2)
        print(f"wrote {json_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
