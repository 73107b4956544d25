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


@dataclass(frozen=True)
class PathNeg:
    """Negated property set ``!(p1|^p2|...)``: forward edges whose predicate
    is NOT in ``fwd``, plus reversed edges whose predicate is NOT in ``inv``
    (SPARQL 1.1 §9.1; only present when the set names inverse members)."""

    fwd: tuple  # predicate IRIs excluded in forward direction
    inv: tuple  # predicate IRIs excluded in inverse direction
    has_fwd: bool = True  # whether forward direction participates
    has_inv: bool = False


Path = Union[
    PathLink, PathInv, PathSeq, PathAlt, PathStar, PathPlus, PathOpt, PathNeg
]


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
class ServicePattern:
    """SPARQL 1.1 Federated Query SERVICE clause. Two target spaces:
    engine-internal federation (``urn:repo:{name}`` names a sibling
    repository in the same catalog — the pattern evaluates against its
    quad store, data never leaves the cluster) and wire federation
    (``http(s)://...`` — the group is re-serialized from its captured
    source tokens and POSTed to the remote SPARQL-protocol endpoint,
    sparql/federation.py). ``raw_select`` is the self-contained
    ``SELECT *`` re-serialization (prefixes replayed) the parser captures
    for the wire path; None for programmatically built ASTs."""

    target: Var | IRI
    group: GroupPattern
    silent: bool = False
    raw_select: str | None = None


@dataclass(frozen=True)
class QuotedPattern:
    """SPARQL-star quoted triple pattern << s p o >> in a subject/object
    position: components may be variables (bound by decomposing stored
    quoted terms) or ground terms."""

    s: Any
    p: Any
    o: Any


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
    from_graphs: list[str] = field(default_factory=list)   # FROM (SURVEY §2.6 F6)
    from_named: list[str] = field(default_factory=list)    # FROM NAMED


@dataclass
class AskQuery:
    where: GroupPattern
    from_graphs: list[str] = field(default_factory=list)
    from_named: list[str] = field(default_factory=list)


@dataclass
class ConstructQuery:
    template: list[TriplePattern]
    where: GroupPattern
    limit: int | None = None
    offset: int | None = None
    from_graphs: list[str] = field(default_factory=list)
    from_named: list[str] = field(default_factory=list)


@dataclass
class DescribeQuery:
    terms: list[Var | IRI]
    where: GroupPattern | None
    from_graphs: list[str] = field(default_factory=list)
    from_named: list[str] = field(default_factory=list)


Query = Union[SelectQuery, AskQuery, ConstructQuery, DescribeQuery]


# ---------------------------------------------------------------------------
# SPARQL 1.1 Update (SURVEY §2.1 S7 — engine surface; the reference only
# exercises the add path via POST /statements, init-graphdb.sh:90)
# ---------------------------------------------------------------------------

# A "quad template": (graph, triple) where graph is None (default graph),
# an IRI, or a Var (only meaningful inside Modify templates/WHERE).
QuadTemplate = tuple[Any, TriplePattern]


@dataclass
class InsertDataOp:
    quads: list[QuadTemplate]  # ground terms only


@dataclass
class DeleteDataOp:
    quads: list[QuadTemplate]  # ground terms only


@dataclass
class ModifyOp:
    """DELETE/INSERT ... WHERE (also covers DELETE WHERE shorthand)."""

    delete: list[QuadTemplate] | None
    insert: list[QuadTemplate] | None
    where: GroupPattern
    with_graph: str | None = None
    using: list[str] = field(default_factory=list)
    using_named: list[str] = field(default_factory=list)


@dataclass
class LoadOp:
    source: str
    graph: str | None = None
    silent: bool = False


@dataclass
class ClearOp:
    # ("graph", iri) | ("default",) | ("named",) | ("all",)
    target: tuple
    silent: bool = False
    drop: bool = False  # DROP ≡ CLEAR in our store (graphs are implicit)


@dataclass
class CreateOp:
    graph: str
    silent: bool = False


@dataclass
class GraphCopyOp:
    kind: str  # COPY | MOVE | ADD
    src: str | None  # None = default graph
    dst: str | None
    silent: bool = False


UpdateOp = Union[
    InsertDataOp, DeleteDataOp, ModifyOp, LoadOp, ClearOp, CreateOp, GraphCopyOp
]
