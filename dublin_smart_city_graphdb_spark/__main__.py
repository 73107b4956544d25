"""Operational CLI — the reference's deployment scripts as one command.

The reference repo is a deployment harness: ``entrypoint.sh`` starts the
engine and ``init-graphdb.sh`` creates the repository, bulk-loads Turtle
and verifies with a COUNT query. This module is that surface for the
Spark engine:

    python -m dublin_smart_city_graphdb_spark init \\
        --repo dublin_facilities --ruleset rdfsplus \\
        --data ontology.ttl --data areas.ttl [--warehouse /path]

    python -m dublin_smart_city_graphdb_spark serve \\
        --port 7200 [--warehouse /path]

    python -m dublin_smart_city_graphdb_spark query \\
        --repo dublin_facilities 'SELECT * WHERE { ?s ?p ?o } LIMIT 5'

``init`` mirrors ``init-graphdb.sh:36-143``: idempotent create → load
each document → COUNT verification (warns on zero, exits 0 — the
reference warns too). ``serve`` binds the SPARQL-protocol facade and
blocks, like ``entrypoint.sh`` tailing the daemon.
"""

from __future__ import annotations

import argparse
import sys


def _engine(args):
    from dublin_smart_city_graphdb_spark.engine import Engine
    from dublin_smart_city_graphdb_spark.session import get_spark

    return Engine(get_spark(), warehouse=args.warehouse)


def cmd_init(args) -> int:
    eng = _engine(args)
    rules = None
    if args.rules_file:
        # custom-ruleset file (GraphDB .pie analog): CONSTRUCT rules
        # separated by blank lines
        with open(args.rules_file, encoding="utf-8") as f:
            rules = [r.strip() for r in f.read().split("\n\n") if r.strip()]
    repo = eng.create_repository(
        args.repo, ruleset=args.ruleset, query_timeout=args.timeout,
        rules=rules,
    )
    for path in args.data:
        n = repo.load_turtle(path)
        print(f"loaded {n} statements from {path}")
    # verification read-back (init-graphdb.sh:133-143)
    count = repo.count()
    print(f"repository {args.repo!r} holds {count} statements")
    if count == 0:
        print("WARNING: repository is empty", file=sys.stderr)
    return 0


def cmd_serve(args) -> int:
    from dublin_smart_city_graphdb_spark.protocol_http import SparqlHttpServer

    eng = _engine(args)
    srv = SparqlHttpServer(eng, host=args.host, port=args.port).start()
    print(f"SPARQL protocol on http://{srv.host}:{srv.port}/repositories/…")
    try:
        import threading

        threading.Event().wait()  # serve until interrupted
    except KeyboardInterrupt:
        srv.stop()
    return 0


def cmd_query(args) -> int:
    eng = _engine(args)
    repo = eng.repository(args.repo)
    payload, _ = repo.sparql_serialized(args.query, accept=args.accept)
    print(payload)
    return 0


def cmd_dump(args) -> int:
    eng = _engine(args)
    info = eng.dump_repository(args.repo, args.dest)
    print(f"dumped {info['statements']} statements of {args.repo!r} "
          f"to {args.dest}")
    return 0


def cmd_restore(args) -> int:
    eng = _engine(args)
    repo = eng.restore_repository(args.repo, args.src)
    print(f"restored {args.repo!r} from {args.src}: "
          f"{repo.count()} statements")
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="dublin_smart_city_graphdb_spark")
    ap.add_argument("--warehouse", default=None, help="persistent store dir")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("init", help="create repository + bulk load + verify")
    p.add_argument("--repo", required=True)
    p.add_argument("--ruleset", default="rdfsplus")
    p.add_argument(
        "--rules-file", default=None,
        help="custom ruleset: file of CONSTRUCT rules separated by blank "
             "lines (use with --ruleset custom)",
    )
    p.add_argument("--timeout", type=float, default=30.0)
    p.add_argument("--data", action="append", default=[])
    p.set_defaults(fn=cmd_init)

    p = sub.add_parser("serve", help="serve the SPARQL protocol over HTTP")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7200)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("query", help="run one SPARQL query")
    p.add_argument("--repo", required=True)
    p.add_argument(
        "--accept", default="application/sparql-results+json"
    )
    p.add_argument("query")
    p.set_defaults(fn=cmd_query)

    p = sub.add_parser(
        "dump", help="export a repository (N-Quads + config)"
    )
    p.add_argument("--repo", required=True)
    p.add_argument("--dest", required=True)
    p.set_defaults(fn=cmd_dump)

    p = sub.add_parser(
        "restore", help="recreate a repository from a dump directory"
    )
    p.add_argument("--repo", required=True)
    p.add_argument("--src", required=True)
    p.set_defaults(fn=cmd_restore)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
