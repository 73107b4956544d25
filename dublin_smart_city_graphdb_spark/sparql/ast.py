"""SPARQL abstract syntax: patterns, paths, expressions, query forms.

Node names follow the SPARQL 1.1 algebra (BGP, Join, LeftJoin/Optional,
Union, Minus, Extend/Bind, Filter, Group, OrderBy, Slice, Distinct, Project)
so the compiler reads like the public spec (SURVEY.md §3 E1).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Union

from dublin_smart_city_graphdb_spark.model.terms import BNode, IRI, Literal, Term


@dataclass(frozen=True)
class Var:
    name: str

    def __str__(self) -> str:
        return f"?{self.name}"


PatternTerm = Union[Var, IRI, Literal, BNode]


# ---------------------------------------------------------------------------
# Property paths (SURVEY §2.2 P7)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PathLink:
    iri: str


@dataclass(frozen=True)
class PathInv:
    inner: Any


@dataclass(frozen=True)
class PathSeq:
    parts: tuple


@dataclass(frozen=True)
class PathAlt:
    parts: tuple


@dataclass(frozen=True)
class PathStar:
    inner: Any


@dataclass(frozen=True)
class PathPlus:
    inner: Any


@dataclass(frozen=True)
class PathOpt:
    inner: Any


Path = Union[PathLink, PathInv, PathSeq, PathAlt, PathStar, PathPlus, PathOpt]


# ---------------------------------------------------------------------------
# Graph patterns
# ---------------------------------------------------------------------------

@dataclass
class TriplePattern:
    s: PatternTerm
    p: PatternTerm | Path
    o: PatternTerm


@dataclass
class BGP:
    triples: list[TriplePattern]


@dataclass
class GroupPattern:
    """Sequence of pattern elements joined left-to-right; FILTERs apply to
    the whole group (SPARQL group graph pattern scoping)."""

    elements: list[Any] = field(default_factory=list)
    filters: list[Any] = field(default_factory=list)


@dataclass
class OptionalPattern:
    group: GroupPattern


@dataclass
class UnionPattern:
    branches: list[GroupPattern]


@dataclass
class MinusPattern:
    group: GroupPattern


@dataclass
class GraphGraphPattern:
    graph: Var | IRI
    group: GroupPattern


@dataclass
class BindPattern:
    expr: Any
    var: Var


@dataclass
class ValuesPattern:
    vars: list[Var]
    rows: list[list[Term | None]]  # None = UNDEF


@dataclass
class SubSelectPattern:
    query: SelectQuery


# ---------------------------------------------------------------------------
# Expressions
# ---------------------------------------------------------------------------

@dataclass
class OrExpr:
    parts: list[Any]


@dataclass
class AndExpr:
    parts: list[Any]


@dataclass
class Compare:
    op: str  # = != < > <= >=
    left: Any
    right: Any


@dataclass
class Arith:
    op: str  # + - * /
    left: Any
    right: Any


@dataclass
class UnaryMinus:
    inner: Any


@dataclass
class NotExpr:
    inner: Any


@dataclass
class InExpr:
    expr: Any
    options: list[Any]
    negated: bool


@dataclass
class FuncCall:
    name: str  # upper-cased builtin name
    args: list[Any]


@dataclass
class ExistsExpr:
    group: GroupPattern
    negated: bool


@dataclass
class Aggregate:
    func: str  # COUNT SUM AVG MIN MAX GROUP_CONCAT SAMPLE
    expr: Any | None  # None = COUNT(*)
    distinct: bool = False
    separator: str = " "


# ---------------------------------------------------------------------------
# Query forms (SURVEY §2.6)
# ---------------------------------------------------------------------------

@dataclass
class SelectQuery:
    projections: list[tuple[Any, Var | None]]  # (Var|expr, alias); [] = *
    where: GroupPattern
    distinct: bool = False
    reduced: bool = False
    group_by: list[Any] = field(default_factory=list)
    having: list[Any] = field(default_factory=list)
    order_by: list[tuple[Any, bool]] = field(default_factory=list)  # (expr, asc)
    limit: int | None = None
    offset: int | None = None


@dataclass
class AskQuery:
    where: GroupPattern


@dataclass
class ConstructQuery:
    template: list[TriplePattern]
    where: GroupPattern
    limit: int | None = None
    offset: int | None = None


@dataclass
class DescribeQuery:
    terms: list[Var | IRI]
    where: GroupPattern | None


Query = Union[SelectQuery, AskQuery, ConstructQuery, DescribeQuery]
