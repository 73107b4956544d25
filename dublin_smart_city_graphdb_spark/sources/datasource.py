"""`spark.read.format("rdf")` — a PySpark 4 Python DataSource for RDF files.

The idiomatic-Spark face of the loaders in ``sources/turtle.py``: register
once (``register_rdf_source(spark)``) and any Turtle / N-Triples / N-Quads
file or directory reads straight into the canonical QUAD_SCHEMA DataFrame,
with Catalyst seeing an ordinary scan it can column-prune and filter.

Partitioning model (what makes this scale):

- ``.nt`` / ``.nq``: line-delimited, so big files split into byte-range
  partitions (default 64 MB) that align on newlines — the same splittable
  contract as Spark's text source, executor-side parse, no driver
  bottleneck.
- ``.ttl``: Turtle grammar is stateful (prefixes, multi-line literals), so
  each FILE is one partition — many files still parallelize; one giant
  Turtle file should be converted to N-Triples for bulk loads (documented
  tradeoff, same as every RDF store's bulk path).
- gzip (``.gz``): whole-file partitions (the codec is not splittable).

Options: ``path`` (file or directory), ``graph`` (default-graph override
for triple formats).
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from dublin_smart_city_graphdb_spark.model.schema import QUAD_SCHEMA

_SPLIT_BYTES = 64 * 1024 * 1024


class _RdfPartition(InputPartition):
    def __init__(self, path: str, kind: str, start: int = 0, end: int | None = None):
        self.path = path
        self.kind = kind  # "ttl" | "nt" | "nq"
        self.start = start
        self.end = end


def _expand(path: str) -> list[str]:
    if os.path.isdir(path):
        out = []
        for ext in ("ttl", "nt", "nq", "ttl.gz", "nt.gz", "nq.gz"):
            out.extend(_glob.glob(os.path.join(path, f"*.{ext}")))
        return sorted(out)
    return sorted(_glob.glob(path)) or [path]


def _kind_of(path: str) -> str:
    base = path[:-3] if path.endswith(".gz") else path
    ext = base.rsplit(".", 1)[-1].lower()
    if ext in ("nt", "ntriples"):
        return "nt"
    if ext in ("nq", "nquads"):
        return "nq"
    return "ttl"


class RdfDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rdf"

    def schema(self):
        return QUAD_SCHEMA

    def reader(self, schema) -> "RdfReader":
        return RdfReader(self.options)


class RdfReader(DataSourceReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("rdf datasource: 'path' option is required")
        self._graph = options.get("graph")

    def partitions(self):
        parts: list[_RdfPartition] = []
        for f in _expand(self._path):
            kind = _kind_of(f)
            if (
                kind in ("nt", "nq")
                and not f.endswith(".gz")
                and os.path.getsize(f) > _SPLIT_BYTES
            ):
                size = os.path.getsize(f)
                start = 0
                while start < size:
                    parts.append(
                        _RdfPartition(
                            f, kind, start, min(start + _SPLIT_BYTES, size)
                        )
                    )
                    start += _SPLIT_BYTES
            else:
                parts.append(_RdfPartition(f, kind))
        return parts

    def read(self, part: _RdfPartition):
        from dublin_smart_city_graphdb_spark.sources.turtle import (
            parse_ntriples_lines,
            turtle_to_rows,
        )

        if part.kind == "ttl":
            raw = _read_whole(part.path)
            yield from turtle_to_rows(raw, graph=self._graph)
            return
        allow_graph = part.kind == "nq"
        if part.end is None:
            text = _read_whole(part.path)
            yield from parse_ntriples_lines(
                iter(text.splitlines()), self._graph, allow_graph=allow_graph
            )
            return
        # byte-range split: each range parses the lines that START inside
        # it (a line spanning the boundary belongs to the range it starts
        # in — the standard text-split contract)
        with open(part.path, "rb") as fh:
            fh.seek(part.start)
            if part.start > 0:
                fh.readline()  # skip the partial line owned by the prior range
            lines: list[str] = []
            while fh.tell() <= part.end:
                line = fh.readline()
                if not line:
                    break
                lines.append(line.decode("utf-8"))
        yield from parse_ntriples_lines(
            iter(lines), self._graph, allow_graph=allow_graph
        )


def _read_whole(path: str) -> str:
    if path.endswith(".gz"):
        with gzip.open(path, "rb") as fh:
            return io.TextIOWrapper(fh, encoding="utf-8").read()
    with open(path, encoding="utf-8") as fh:
        return fh.read()


def register_rdf_source(spark) -> None:
    """Register the format so ``spark.read.format('rdf')`` resolves."""
    spark.dataSource.register(RdfDataSource)
