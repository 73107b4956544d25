"""SPARQL 1.1 tokenizer + recursive-descent parser → AST (sparql/ast.py).

Hand-rolled against the public W3C SPARQL 1.1 grammar (no rdflib in this
environment). Covers the query surface inventoried in SURVEY.md §2:
SELECT/ASK/CONSTRUCT/DESCRIBE, BGPs with ``a``/``;``/``,`` sugar, property
paths, OPTIONAL/UNION/MINUS/GRAPH/BIND/VALUES/sub-SELECT, FILTER with
EXISTS/NOT EXISTS, aggregates, and solution modifiers.
"""

from __future__ import annotations

import re

from dublin_smart_city_graphdb_spark.model.terms import (
    RDF,
    RDF_TYPE,
    XSD,
    BNode,
    IRI,
    Literal,
)
from dublin_smart_city_graphdb_spark.sparql.ast import (
    Aggregate, AndExpr, Arith, AskQuery, BGP, BindPattern, ClearOp, Compare,
    QuotedPattern,
    ConstructQuery, CreateOp, DeleteDataOp, DescribeQuery, ExistsExpr,
    FuncCall, GraphCopyOp, GraphGraphPattern, GroupPattern, InExpr,
    InsertDataOp, LoadOp, MinusPattern, ModifyOp, NotExpr, OptionalPattern,
    OrExpr, PathAlt, PathInv, PathLink, PathNeg, PathOpt, PathPlus, PathSeq,
    PathStar, SelectQuery, ServicePattern, SubSelectPattern, TriplePattern,
    UnaryMinus, UnionPattern, ValuesPattern, Var,
)
from dublin_smart_city_graphdb_spark.sources.turtle import _unescape

_SPARQL_TOKEN = re.compile(
    r"""
      (?P<WS>\s+|\#[^\n]*)
    | (?P<IRIREF><(?:[^<>"{}|^`\\\x00-\x20]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*>)
    | (?P<VAR>[?$][A-Za-z0-9_]+)
    | (?P<STRING_LONG2>\"\"\"(?:[^"\\]|\\.|\"(?!\"\"))*\"\"\")
    | (?P<STRING_LONG1>'''(?:[^'\\]|\\.|'(?!''))*''')
    | (?P<STRING2>"(?:[^"\\\n]|\\.)*")
    | (?P<STRING1>'(?:[^'\\\n]|\\.)*')
    | (?P<LANGTAG>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
    | (?P<DOUBLE>(?:\d+\.\d*|\.\d+|\d+)[eE][+-]?\d+)
    | (?P<DECIMAL>\d*\.\d+)
    | (?P<INTEGER>\d+)
    | (?P<BNODE>_:[A-Za-z0-9_][A-Za-z0-9_.-]*)
    | (?P<PNAME>(?:[A-Za-z_][A-Za-z0-9_-]*)?:(?:(?:[A-Za-z0-9_.%-]|\\[_~.!$&'()*+,;=/?\#@%-])*(?:[A-Za-z0-9_%-]|\\[_~.!$&'()*+,;=/?\#@%-]))?)
    | (?P<NAME>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<OP><<|>>|\^\^|&&|\|\||!=|<=|>=|[=<>!+\-*/|^?()\[\]{},.;])
    """,
    re.VERBOSE,
)

# IRIREF admits numeric escapes (UCHAR: \uXXXX / \UXXXXXXXX) and nothing
# else — decoded at token→IRI time, exactly once (grammar §19.2).
_UCHAR = re.compile(r"\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})")


def _iri_unescape(s: str) -> str:
    return _UCHAR.sub(
        lambda m: chr(int(m.group(1) or m.group(2), 16)), s
    )


_KEYWORDS = {
    "SELECT", "ASK", "CONSTRUCT", "DESCRIBE", "WHERE", "FROM", "NAMED",
    "PREFIX", "BASE", "DISTINCT", "REDUCED", "AS", "OPTIONAL", "UNION",
    "MINUS", "GRAPH", "SERVICE", "FILTER", "BIND", "VALUES", "UNDEF",
    "GROUP", "BY",
    "HAVING", "ORDER", "ASC", "DESC", "LIMIT", "OFFSET", "EXISTS", "NOT",
    "IN", "A", "TRUE", "FALSE",
    # SPARQL 1.1 Update (SURVEY §2.1 S7)
    "INSERT", "DELETE", "DATA", "WITH", "USING", "INTO", "TO", "SILENT",
    "DEFAULT", "ALL", "CLEAR", "DROP", "CREATE", "COPY", "MOVE", "ADD",
    "LOAD",
}

_AGG_FUNCS = {"COUNT", "SUM", "AVG", "MIN", "MAX", "GROUP_CONCAT", "SAMPLE"}

_BUILTINS = {
    "STR", "LANG", "LANGMATCHES", "DATATYPE", "BOUND", "IRI", "URI", "BNODE",
    "RAND", "ABS", "CEIL", "FLOOR", "ROUND", "CONCAT", "STRLEN", "UCASE",
    "LCASE", "ENCODE_FOR_URI", "CONTAINS", "STRSTARTS", "STRENDS",
    "STRBEFORE", "STRAFTER", "YEAR", "MONTH", "DAY", "HOURS", "MINUTES",
    "SECONDS", "TIMEZONE", "TZ", "NOW", "UUID", "STRUUID", "MD5", "SHA1",
    "SHA256", "SHA384", "SHA512", "COALESCE", "IF", "STRLANG", "STRDT",
    "SAMETERM", "ISIRI", "ISURI", "ISBLANK", "ISLITERAL", "ISNUMERIC",
    "REGEX", "SUBSTR", "REPLACE",
    "TRIPLE", "SUBJECT", "PREDICATE", "OBJECT", "ISTRIPLE",
}


class SparqlParser:
    def __init__(self, text: str):
        self.tokens: list[tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _SPARQL_TOKEN.match(text, pos)
            if not m:
                raise ValueError(f"sparql: cannot tokenize at {text[pos:pos + 40]!r}")
            pos = m.end()
            if m.lastgroup != "WS":
                self.tokens.append((m.lastgroup, m.group()))
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self._bnode_n = 0

    # -- token helpers ------------------------------------------------------
    def _peek(self, ahead: int = 0) -> tuple[str, str]:
        j = self.i + ahead
        return self.tokens[j] if j < len(self.tokens) else ("EOF", "")

    def _kw(self, ahead: int = 0) -> str | None:
        kind, v = self._peek(ahead)
        return v.upper() if kind == "NAME" and v.upper() in _KEYWORDS | _AGG_FUNCS | _BUILTINS else None

    def _next(self) -> tuple[str, str]:
        tok = self._peek()
        self.i += 1
        return tok

    def _expect_op(self, op: str):
        kind, v = self._next()
        if v != op:
            raise ValueError(f"sparql: expected {op!r}, got {v!r}")

    def _expect_kw(self, kw: str):
        kind, v = self._next()
        if kind != "NAME" or v.upper() != kw:
            raise ValueError(f"sparql: expected {kw}, got {v!r}")

    def _accept_kw(self, kw: str) -> bool:
        if self._kw() == kw:
            self._next()
            return True
        return False

    def _accept_op(self, op: str) -> bool:
        if self._peek()[1] == op:
            self._next()
            return True
        return False

    # -- entry --------------------------------------------------------------
    def parse(self):
        self._prologue()
        kw = self._kw()
        if kw == "SELECT":
            q = self._select_query(top=True)
        elif kw == "ASK":
            q = self._ask_query()
        elif kw == "CONSTRUCT":
            q = self._construct_query()
        elif kw == "DESCRIBE":
            q = self._describe_query()
        else:
            raise ValueError(f"sparql: expected query form, got {self._peek()[1]!r}")
        if self._peek()[0] != "EOF":
            raise ValueError(f"sparql: trailing tokens at {self._peek()[1]!r}")
        # The query BASE travels with the AST: IRI()/URI() resolve runtime
        # relative references against it (spec §17.4.2.8).
        q.base = self.base
        return q

    def _prologue(self):
        while True:
            kw = self._kw()
            if kw == "PREFIX":
                self._next()
                _, pname = self._next()
                # grammar PNAME_NS is `PN_PREFIX? ':'` — the declared
                # name MUST end with the colon ("PREFIX ex <...>" is a
                # syntax error, not an implicit "ex:")
                if not pname.endswith(":"):
                    raise ValueError(
                        f"sparql: PREFIX name {pname!r} must end with ':'"
                    )
                ns = pname[:-1]
                _, iriref = self._next()
                if not (iriref.startswith("<") and iriref.endswith(">")):
                    raise ValueError(
                        f"sparql: PREFIX {pname} expects an IRIREF, "
                        f"got {iriref!r}"
                    )
                self.prefixes[ns] = _iri_unescape(iriref[1:-1])
            elif kw == "BASE":
                self._next()
                _, iriref = self._next()
                self.base = _iri_unescape(iriref[1:-1])
            else:
                return

    # -- query forms --------------------------------------------------------
    def _select_query(self, top: bool) -> SelectQuery:
        self._expect_kw("SELECT")
        # grammar: ( DISTINCT | REDUCED )? — one modifier, never both
        distinct = self._accept_kw("DISTINCT")
        reduced = self._accept_kw("REDUCED")
        if distinct and reduced:
            raise ValueError(
                "sparql: SELECT takes DISTINCT or REDUCED, not both"
            )
        projections: list[tuple[object, Var | None]] = []
        if self._accept_op("*"):
            pass
        else:
            while True:
                kind, v = self._peek()
                if kind == "VAR":
                    self._next()
                    projections.append((Var(v[1:]), None))
                elif v == "(":
                    self._next()
                    expr = self._expression()
                    self._expect_kw("AS")
                    _, vv = self._next()
                    projections.append((expr, Var(vv[1:])))
                    self._expect_op(")")
                else:
                    break
            if not projections:
                raise ValueError("sparql: SELECT needs projections or *")
        from_graphs, from_named = self._dataset_clauses()
        self._accept_kw("WHERE")
        where = self._group_graph_pattern()
        q = SelectQuery(projections=projections, where=where,
                        distinct=distinct, reduced=reduced,
                        from_graphs=from_graphs, from_named=from_named)
        self._solution_modifiers(q)
        return q

    def _dataset_clauses(self) -> tuple[list[str], list[str]]:
        """FROM / FROM NAMED (SURVEY §2.6 F6): FROM graphs merge into the
        default graph; FROM NAMED graphs are the ones GRAPH may range over."""
        from_graphs: list[str] = []
        from_named: list[str] = []
        while self._kw() == "FROM":
            self._next()
            named = self._accept_kw("NAMED")
            t = self._term()
            if not isinstance(t, IRI):
                raise ValueError("sparql: FROM needs an IRI")
            (from_named if named else from_graphs).append(t.value)
        return from_graphs, from_named

    def _ask_query(self) -> AskQuery:
        self._expect_kw("ASK")
        from_graphs, from_named = self._dataset_clauses()
        self._accept_kw("WHERE")
        return AskQuery(where=self._group_graph_pattern(),
                        from_graphs=from_graphs, from_named=from_named)

    def _construct_query(self) -> ConstructQuery:
        self._expect_kw("CONSTRUCT")
        if self._peek()[1] != "{":
            # CONSTRUCT WHERE { BGP } shorthand (spec §10.2.3): the WHERE
            # pattern doubles as the template. Dataset clauses may precede
            # WHERE; the group must be a plain BGP (enforced by reusing its
            # triple patterns as the template).
            from_graphs, from_named = self._dataset_clauses()
            self._expect_kw("WHERE")
            where = self._group_graph_pattern()
            from dublin_smart_city_graphdb_spark.sparql.ast import BGP

            if where.filters or not all(
                isinstance(e, BGP) for e in where.elements
            ):
                raise ValueError(
                    "CONSTRUCT WHERE shorthand allows only a plain BGP"
                )
            template = [tp for e in where.elements for tp in e.triples]
            q = ConstructQuery(template=template, where=where,
                               from_graphs=from_graphs, from_named=from_named)
            if self._accept_kw("LIMIT"):
                q.limit = int(self._next()[1])
            if self._accept_kw("OFFSET"):
                q.offset = int(self._next()[1])
            return q
        self._expect_op("{")
        template: list[TriplePattern] = []
        while self._peek()[1] != "}":
            template.extend(self._triples_same_subject())
            if not self._accept_op("."):
                break
        self._expect_op("}")
        from_graphs, from_named = self._dataset_clauses()
        self._accept_kw("WHERE")
        where = self._group_graph_pattern()
        q = ConstructQuery(template=template, where=where,
                           from_graphs=from_graphs, from_named=from_named)
        if self._accept_kw("LIMIT"):
            q.limit = int(self._next()[1])
        if self._accept_kw("OFFSET"):
            q.offset = int(self._next()[1])
        return q

    def _describe_query(self) -> DescribeQuery:
        self._expect_kw("DESCRIBE")
        terms: list[Var | IRI] = []
        while True:
            kind, v = self._peek()
            if kind == "VAR":
                self._next()
                terms.append(Var(v[1:]))
            elif kind in ("IRIREF", "PNAME"):
                terms.append(self._term())
            else:
                break
        from_graphs, from_named = self._dataset_clauses()
        where = None
        if self._kw() == "WHERE" or self._peek()[1] == "{":
            self._accept_kw("WHERE")
            where = self._group_graph_pattern()
        return DescribeQuery(terms=terms, where=where,
                             from_graphs=from_graphs, from_named=from_named)

    def _solution_modifiers(self, q: SelectQuery):
        if self._accept_kw("GROUP"):
            self._expect_kw("BY")
            while True:
                kind, v = self._peek()
                if kind == "VAR":
                    self._next()
                    q.group_by.append(Var(v[1:]))
                elif v == "(":
                    self._next()
                    expr = self._expression()
                    if self._accept_kw("AS"):
                        _, vv = self._next()
                        q.group_by.append((expr, Var(vv[1:])))
                    else:
                        q.group_by.append((expr, None))
                    self._expect_op(")")
                else:
                    break
        if self._accept_kw("HAVING"):
            while self._peek()[1] == "(":
                q.having.append(self._bracketted_expression())
        if self._accept_kw("ORDER"):
            self._expect_kw("BY")
            while True:
                kw = self._kw()
                kind, v = self._peek()
                if kw == "ASC" or kw == "DESC":
                    self._next()
                    q.order_by.append((self._bracketted_expression(), kw == "ASC"))
                elif kind == "VAR":
                    self._next()
                    q.order_by.append((Var(v[1:]), True))
                elif v == "(":
                    q.order_by.append((self._bracketted_expression(), True))
                elif kind == "NAME" and v.upper() in _BUILTINS:
                    q.order_by.append((self._builtin_call(), True))
                else:
                    break
        # LIMIT/OFFSET in either order
        for _ in range(2):
            if self._accept_kw("LIMIT"):
                q.limit = int(self._next()[1])
            elif self._accept_kw("OFFSET"):
                q.offset = int(self._next()[1])
        if self._kw() == "VALUES":
            vp = self._values_pattern()
            q.where.elements.append(vp)

    # -- group graph pattern -------------------------------------------------
    def _group_graph_pattern(self) -> GroupPattern:
        self._expect_op("{")
        group = GroupPattern()
        while True:
            kind, v = self._peek()
            kw = self._kw()
            if v == "}":
                self._next()
                return group
            if kw == "SELECT":
                group.elements.append(SubSelectPattern(self._select_query(top=False)))
            elif kw == "OPTIONAL":
                self._next()
                group.elements.append(OptionalPattern(self._group_graph_pattern()))
            elif kw == "MINUS":
                self._next()
                group.elements.append(MinusPattern(self._group_graph_pattern()))
            elif kw == "GRAPH":
                self._next()
                gkind, gv = self._peek()
                if gkind == "VAR":
                    self._next()
                    gterm: Var | IRI = Var(gv[1:])
                else:
                    t = self._term()
                    if not isinstance(t, IRI):
                        raise ValueError("sparql: GRAPH needs var or IRI")
                    gterm = t
                group.elements.append(
                    GraphGraphPattern(gterm, self._group_graph_pattern())
                )
            elif kw == "SERVICE":
                self._next()
                silent = bool(self._accept_kw("SILENT"))
                skind, sv = self._peek()
                if skind == "VAR":
                    self._next()
                    sterm: Var | IRI = Var(sv[1:])
                else:
                    t = self._term()
                    if not isinstance(t, IRI):
                        raise ValueError("sparql: SERVICE needs var or IRI")
                    sterm = t
                # capture the group's raw token span so an http(s) target
                # can be re-serialized verbatim for the remote endpoint
                # (SPARQL is whitespace-insensitive, so re-joining lexemes
                # reproduces an equivalent query; prefixes are replayed)
                body_start = self.i
                sgroup = self._group_graph_pattern()
                body = " ".join(v for _, v in self.tokens[body_start:self.i])
                header = "".join(
                    f"PREFIX {p}: <{iri}>\n" for p, iri in self.prefixes.items()
                )
                if self.base:
                    header = f"BASE <{self.base}>\n" + header
                group.elements.append(
                    ServicePattern(
                        sterm, sgroup, silent,
                        raw_select=header + "SELECT * WHERE " + body,
                    )
                )
            elif kw == "FILTER":
                self._next()
                group.filters.append(self._constraint())
            elif kw == "BIND":
                self._next()
                self._expect_op("(")
                expr = self._expression()
                self._expect_kw("AS")
                _, vv = self._next()
                self._expect_op(")")
                group.elements.append(BindPattern(expr, Var(vv[1:])))
            elif kw == "VALUES":
                group.elements.append(self._values_pattern())
            elif v == "{":
                # group-or-union
                first = self._group_graph_pattern()
                branches = [first]
                while self._accept_kw("UNION"):
                    branches.append(self._group_graph_pattern())
                if len(branches) == 1:
                    group.elements.append(first)
                else:
                    group.elements.append(UnionPattern(branches))
            else:
                triples: list[TriplePattern] = []
                while True:
                    triples.extend(self._triples_same_subject())
                    if self._accept_op("."):
                        kind2, v2 = self._peek()
                        if v2 == "}" or self._kw() in (
                            "OPTIONAL", "MINUS", "GRAPH", "SERVICE",
                            "FILTER", "BIND", "VALUES", "SELECT",
                        ) or v2 == "{":
                            break
                        continue
                    break
                group.elements.append(BGP(triples))
                continue
            # GraphPatternNotTriples '.'? — the grammar allows an optional
            # dot after FILTER/BIND/VALUES/OPTIONAL/UNION/GRAPH/MINUS/
            # SERVICE/sub-SELECT/nested groups (GroupGraphPatternSub)
            self._accept_op(".")

    def _constraint(self):
        kw = self._kw()
        if kw in ("EXISTS", "NOT"):
            return self._exists_expr()
        if self._peek()[1] == "(":
            return self._bracketted_expression()
        return self._builtin_call()

    def _exists_expr(self) -> ExistsExpr:
        negated = False
        if self._accept_kw("NOT"):
            negated = True
        self._expect_kw("EXISTS")
        return ExistsExpr(self._group_graph_pattern(), negated)

    def _values_pattern(self) -> ValuesPattern:
        self._expect_kw("VALUES")
        vars_: list[Var] = []
        rows: list[list] = []
        kind, v = self._peek()
        if kind == "VAR":
            self._next()
            vars_.append(Var(v[1:]))
            self._expect_op("{")
            while self._peek()[1] != "}":
                rows.append([self._values_term()])
            self._next()
        else:
            self._expect_op("(")
            while self._peek()[0] == "VAR":
                _, vv = self._next()
                vars_.append(Var(vv[1:]))
            self._expect_op(")")
            self._expect_op("{")
            while self._peek()[1] == "(":
                self._next()
                row = []
                while self._peek()[1] != ")":
                    row.append(self._values_term())
                self._next()
                if len(row) != len(vars_):
                    raise ValueError(
                        f"sparql: VALUES row has {len(row)} terms for "
                        f"{len(vars_)} variables"
                    )
                rows.append(row)
            self._expect_op("}")
        names = [v.name for v in vars_]
        if len(set(names)) != len(names):
            # grammar note on DataBlock: the variable list must not
            # repeat a variable (round 9 — found by syn-neg-values-dup-var)
            raise ValueError(
                "sparql: VALUES repeats a variable in its variable list"
            )
        return ValuesPattern(vars_, rows)

    def _values_term(self):
        if self._kw() == "UNDEF":
            self._next()
            return None
        return self._term()

    # -- triples ------------------------------------------------------------
    def _triples_same_subject(self) -> list[TriplePattern]:
        out: list[TriplePattern] = []
        kind, v = self._peek()
        if v == "[":
            self._next()
            self._bnode_n += 1
            subj: object = BNode(f"q_anon{self._bnode_n}")
            if self._peek()[1] != "]":
                self._predicate_object_list(subj, out)
            self._expect_op("]")
            kw = self._kw()
            if self._peek()[1] not in (".", "}", ";") and (
                kw is None or (kw == "A" and self._peek()[1] == "a")
            ):
                self._predicate_object_list(subj, out)
            return out
        subj = self._graph_term(out)
        # a collection subject may stand alone (its triples are in `out`)
        if out and (self._peek()[1] in (".", "}") or self._peek()[0] == "EOF"):
            return out
        self._predicate_object_list(subj, out)
        return out

    def _predicate_object_list(self, subj, out: list[TriplePattern]):
        while True:
            pred = self._verb_or_path()
            while True:
                obj = self._graph_term(out)
                out.append(TriplePattern(subj, pred, obj))
                # SPARQL-star annotation syntax (round 9): `:s :p :o
                # {| :src ?x |}` asserts the triple AND opens a
                # predicate-object list on its quoted form — sugar for
                # `<< :s :p :o >> :src ?x`. Two-token lookahead keeps
                # `{` starting a nested group graph pattern unambiguous
                # (a group can't begin with `|`).
                while self._peek()[1] == "{" and self._peek(1)[1] == "|":
                    self._next()
                    self._next()
                    if not isinstance(pred, (IRI, Var)):
                        raise ValueError(
                            "sparql: annotation {| |} needs a plain"
                            " predicate, not a path"
                        )
                    self._predicate_object_list(
                        QuotedPattern(subj, pred, obj), out
                    )
                    self._expect_op("|")
                    self._expect_op("}")
                if self._accept_op(","):
                    continue
                break
            if self._accept_op(";"):
                if self._peek()[1] in (".", "}", "]") :
                    return
                if self._peek()[1] == ";":
                    continue
                continue
            return

    def _verb_or_path(self):
        kind, v = self._peek()
        if kind == "VAR":
            self._next()
            return Var(v[1:])
        path = self._path_alt()
        if isinstance(path, PathLink):
            return IRI(path.iri)  # plain predicate fast path
        return path

    def _path_alt(self):
        parts = [self._path_seq()]
        while self._accept_op("|"):
            parts.append(self._path_seq())
        return parts[0] if len(parts) == 1 else PathAlt(tuple(parts))

    def _path_seq(self):
        parts = [self._path_elt_or_inverse()]
        while self._accept_op("/"):
            parts.append(self._path_elt_or_inverse())
        return parts[0] if len(parts) == 1 else PathSeq(tuple(parts))

    def _path_elt_or_inverse(self):
        if self._accept_op("^"):
            return PathInv(self._path_elt())
        return self._path_elt()

    def _path_elt(self):
        prim = self._path_primary()
        kind, v = self._peek()
        if v == "*":
            self._next()
            return PathStar(prim)
        if v == "+":
            self._next()
            return PathPlus(prim)
        if v == "?":
            self._next()
            return PathOpt(prim)
        return prim

    def _path_primary(self):
        kind, v = self._peek()
        if v == "!":
            self._next()
            return self._path_negated_set()
        if v == "(":
            self._next()
            inner = self._path_alt()
            self._expect_op(")")
            return inner
        if kind == "NAME" and v.upper() == "A" and v == "a":
            self._next()
            return PathLink(RDF_TYPE)
        t = self._term()
        if not isinstance(t, IRI):
            raise ValueError(f"sparql: path primary must be IRI, got {t}")
        return PathLink(t.value)

    def _path_negated_set(self) -> PathNeg:
        """``!iri`` | ``!^iri`` | ``!( iri | ^iri | ... )`` (SPARQL §9.1)."""

        def one() -> tuple[bool, str]:
            invert = self._accept_op("^")
            k, tv = self._peek()
            if k == "NAME" and tv == "a":
                self._next()
                return invert, RDF_TYPE
            t = self._term()
            if not isinstance(t, IRI):
                raise ValueError("sparql: negated property set needs IRIs")
            return invert, t.value

        fwd: list[str] = []
        inv: list[str] = []
        if self._accept_op("("):
            while self._peek()[1] != ")":
                invert, iri = one()
                (inv if invert else fwd).append(iri)
                if not self._accept_op("|"):
                    break
            self._expect_op(")")
        else:
            invert, iri = one()
            (inv if invert else fwd).append(iri)
        return PathNeg(
            fwd=tuple(fwd), inv=tuple(inv),
            has_fwd=bool(fwd), has_inv=bool(inv),
        )

    def _graph_term(self, out: list[TriplePattern] | None = None):
        """A term in s/o position; ``out`` receives auxiliary triples from
        blank-node property lists ``[ p o ; ... ]`` and collections
        ``( a b c )`` (rdf:first/rdf:rest chains)."""
        kind, v = self._peek()
        if kind == "VAR":
            self._next()
            return Var(v[1:])
        if v == "<<":
            # SPARQL-star quoted triple pattern (subject/object position)
            self._next()
            qs = self._graph_term(out)
            if self._kw() == "A" and self._peek()[1] == "a":
                self._next()
                qp: object = IRI(RDF_TYPE)
            else:
                qp = self._graph_term(out)
            qo = self._graph_term(out)
            self._expect_op(">>")
            return QuotedPattern(qs, qp, qo)
        if v == "[":
            self._next()
            self._bnode_n += 1
            node = BNode(f"q_anon{self._bnode_n}")
            if self._peek()[1] != "]":
                if out is None:
                    raise ValueError("sparql: [ property list ] not allowed here")
                self._predicate_object_list(node, out)
            self._expect_op("]")
            return node
        if v == "(":
            self._next()
            items = []
            while self._peek()[1] != ")":
                items.append(self._graph_term(out))
            self._next()
            if not items:
                return IRI(RDF + "nil")
            if out is None:
                raise ValueError("sparql: collection not allowed here")
            head: object = IRI(RDF + "nil")
            for item in reversed(items):
                self._bnode_n += 1
                cell = BNode(f"q_list{self._bnode_n}")
                out.append(TriplePattern(cell, IRI(RDF + "first"), item))
                out.append(TriplePattern(cell, IRI(RDF + "rest"), head))
                head = cell
            return head
        return self._term()

    def _term(self):
        kind, v = self._next()
        if kind == "IRIREF":
            iri = _iri_unescape(v[1:-1])
            if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
                from dublin_smart_city_graphdb_spark.model.terms import resolve_iri

                iri = resolve_iri(self.base, iri)
            return IRI(iri)
        if kind == "PNAME":
            ns, _, local = v.partition(":")
            if ns not in self.prefixes:
                raise ValueError(f"sparql: unknown prefix {ns!r}")
            # PN_LOCAL_ESC: backslash-escaped punctuation in local names
            # (`ex:foo\.bar`) denotes the bare character in the IRI
            local = re.sub(r"\\(.)", r"\1", local)
            return IRI(self.prefixes[ns] + local)
        if kind == "BNODE":
            return BNode(v[2:])
        if kind == "NAME" and v == "a":
            return IRI(RDF_TYPE)
        if kind == "NAME" and v.upper() in ("TRUE", "FALSE"):
            return Literal(v.lower(), datatype=XSD + "boolean")
        if kind in ("STRING2", "STRING1", "STRING_LONG2", "STRING_LONG1"):
            q = 3 if kind.startswith("STRING_LONG") else 1
            lex = _unescape(v[q:-q])
            nk, nv = self._peek()
            if nk == "LANGTAG":
                self._next()
                return Literal(lex, lang=nv[1:])
            if nv == "^^":
                self._next()
                dt = self._term()
                return Literal(lex, datatype=dt.value)
            return Literal(lex)
        if kind == "INTEGER":
            return Literal(v, datatype=XSD + "integer")
        if kind == "DECIMAL":
            return Literal(v, datatype=XSD + "decimal")
        if kind == "DOUBLE":
            return Literal(v, datatype=XSD + "double")
        if kind == "OP" and v in ("+", "-"):
            # NumericLiteralPositive / NumericLiteralNegative: a sign
            # directly on a numeric constant in a term position (the
            # grammar folds the sign into the literal's lexical form)
            nk, nv = self._peek()
            if nk in ("INTEGER", "DECIMAL", "DOUBLE"):
                self._next()
                dt = {"INTEGER": "integer", "DECIMAL": "decimal",
                      "DOUBLE": "double"}[nk]
                return Literal(v + nv, datatype=XSD + dt)
        raise ValueError(f"sparql: unexpected term token {v!r}")

    # -- expressions --------------------------------------------------------
    def _bracketted_expression(self):
        self._expect_op("(")
        e = self._expression()
        self._expect_op(")")
        return e

    def _expression(self):
        parts = [self._and_expression()]
        while self._accept_op("||"):
            parts.append(self._and_expression())
        return parts[0] if len(parts) == 1 else OrExpr(parts)

    def _and_expression(self):
        parts = [self._relational()]
        while self._accept_op("&&"):
            parts.append(self._relational())
        return parts[0] if len(parts) == 1 else AndExpr(parts)

    def _relational(self):
        left = self._additive()
        kind, v = self._peek()
        if v in ("=", "!=", "<", ">", "<=", ">="):
            self._next()
            return Compare(v, left, self._additive())
        if self._kw() == "IN":
            self._next()
            return InExpr(left, self._expression_list(), False)
        if self._kw() == "NOT":
            self._next()
            self._expect_kw("IN")
            return InExpr(left, self._expression_list(), True)
        return left

    def _expression_list(self):
        self._expect_op("(")
        out = []
        if self._peek()[1] != ")":
            out.append(self._expression())
            while self._accept_op(","):
                out.append(self._expression())
        self._expect_op(")")
        return out

    def _additive(self):
        left = self._multiplicative()
        while True:
            v = self._peek()[1]
            if v in ("+", "-"):
                self._next()
                left = Arith(v, left, self._multiplicative())
            else:
                return left

    def _multiplicative(self):
        left = self._unary()
        while True:
            v = self._peek()[1]
            if v in ("*", "/"):
                self._next()
                left = Arith(v, left, self._unary())
            else:
                return left

    def _unary(self):
        v = self._peek()[1]
        if v == "!":
            self._next()
            return NotExpr(self._unary())
        if v == "-":
            self._next()
            return UnaryMinus(self._unary())
        if v == "+":
            self._next()
            return self._unary()
        return self._primary()

    def _primary(self):
        kind, v = self._peek()
        if v == "(":
            return self._bracketted_expression()
        if kind == "VAR":
            self._next()
            return Var(v[1:])
        kw = v.upper() if kind == "NAME" else None
        if kw in _AGG_FUNCS:
            return self._aggregate()
        if kw in ("EXISTS", "NOT"):
            return self._exists_expr()
        if kw in _BUILTINS:
            return self._builtin_call()
        t = self._term()
        # iriOrFunction: IRI followed by an arg list is an extension
        # function call (SPARQL grammar [128]; SURVEY §2.9 registry)
        if isinstance(t, IRI) and self._peek()[1] == "(":
            self._next()
            args: list = []
            if self._peek()[1] != ")":
                args.append(self._expression())
                while self._accept_op(","):
                    args.append(self._expression())
            self._expect_op(")")
            return FuncCall(t.value, args)
        return t

    def _aggregate(self) -> Aggregate:
        _, name = self._next()
        func = name.upper()
        self._expect_op("(")
        distinct = self._accept_kw("DISTINCT")
        if self._peek()[1] == "*":
            self._next()
            expr = None
        else:
            expr = self._expression()
        sep = " "
        if func == "GROUP_CONCAT" and self._accept_op(";"):
            _, sepkw = self._next()  # SEPARATOR
            if sepkw.upper() != "SEPARATOR":
                raise ValueError("sparql: expected SEPARATOR")
            self._expect_op("=")
            kind, sv = self._next()
            q = 3 if kind.startswith("STRING_LONG") else 1
            sep = _unescape(sv[q:-q])
        self._expect_op(")")
        if expr is not None and _expr_has_aggregate(expr):
            # grammar: Aggregate operands are built from expressions that
            # cannot themselves contain aggregates (no SUM(AVG(?x)))
            raise ValueError("sparql: aggregate calls cannot be nested")
        return Aggregate(func, expr, distinct, sep)

    def _builtin_call(self) -> FuncCall:
        _, name = self._next()
        func = name.upper()
        args: list = []
        if self._accept_op("("):
            if self._peek()[1] != ")":
                args.append(self._expression())
                while self._accept_op(","):
                    args.append(self._expression())
            self._expect_op(")")
        if func == "BOUND" and not (
            len(args) == 1 and isinstance(args[0], Var)
        ):
            # grammar: BuiltInCall ::= ... | 'BOUND' '(' Var ')' — an
            # arbitrary expression operand is a syntax error
            raise ValueError("sparql: BOUND takes a single variable")
        return FuncCall(func, args)


    # -- SPARQL 1.1 Update (SURVEY §2.1 S7) ---------------------------------
    def parse_update(self) -> list:
        ops: list = []
        self._prologue()
        while self._peek()[0] != "EOF":
            ops.append(self._update_op())
            if self._accept_op(";"):
                self._prologue()
                continue
            break
        if self._peek()[0] != "EOF":
            raise ValueError(f"sparql: trailing tokens at {self._peek()[1]!r}")
        return ops

    def _update_op(self):
        kw = self._kw()
        if kw == "INSERT":
            self._next()
            if self._accept_kw("DATA"):
                return InsertDataOp(self._quad_block(ground=True))
            insert = self._quad_block()
            using, using_named = self._using_clauses()
            self._expect_kw("WHERE")
            return ModifyOp(delete=None, insert=insert,
                            where=self._group_graph_pattern(),
                            using=using, using_named=using_named)
        if kw == "DELETE":
            self._next()
            if self._accept_kw("DATA"):
                return DeleteDataOp(self._quad_block(ground=True))
            if self._accept_kw("WHERE"):
                # DELETE WHERE { quads }: the pattern is also the template
                quads = self._quad_block()
                return ModifyOp(delete=quads, insert=None,
                                where=self._quads_as_group(quads))
            delete = self._quad_block()
            insert = None
            if self._accept_kw("INSERT"):
                insert = self._quad_block()
            using, using_named = self._using_clauses()
            self._expect_kw("WHERE")
            return ModifyOp(delete=delete, insert=insert,
                            where=self._group_graph_pattern(),
                            using=using, using_named=using_named)
        if kw == "WITH":
            self._next()
            g = self._term()
            if not isinstance(g, IRI):
                raise ValueError("sparql: WITH needs an IRI")
            op = self._update_op()
            if not isinstance(op, ModifyOp):
                raise ValueError("sparql: WITH must precede DELETE/INSERT")
            op.with_graph = g.value
            return op
        if kw == "LOAD":
            self._next()
            silent = self._accept_kw("SILENT")
            src = self._term()
            graph = None
            if self._accept_kw("INTO"):
                self._expect_kw("GRAPH")
                graph = self._term().value
            return LoadOp(source=src.value, graph=graph, silent=silent)
        if kw in ("CLEAR", "DROP"):
            self._next()
            silent = self._accept_kw("SILENT")
            return ClearOp(target=self._graph_ref_all(), silent=silent,
                           drop=kw == "DROP")
        if kw == "CREATE":
            self._next()
            silent = self._accept_kw("SILENT")
            self._expect_kw("GRAPH")
            return CreateOp(graph=self._term().value, silent=silent)
        if kw in ("COPY", "MOVE", "ADD"):
            self._next()
            silent = self._accept_kw("SILENT")
            src = self._graph_or_default()
            self._expect_kw("TO")
            dst = self._graph_or_default()
            return GraphCopyOp(kind=kw, src=src, dst=dst, silent=silent)
        raise ValueError(f"sparql: unknown update operation {self._peek()[1]!r}")

    def _graph_ref_all(self) -> tuple:
        if self._accept_kw("DEFAULT"):
            return ("default",)
        if self._accept_kw("NAMED"):
            return ("named",)
        if self._accept_kw("ALL"):
            return ("all",)
        self._accept_kw("GRAPH")
        return ("graph", self._term().value)

    def _graph_or_default(self) -> str | None:
        if self._accept_kw("DEFAULT"):
            return None
        self._accept_kw("GRAPH")
        return self._term().value

    def _using_clauses(self) -> tuple[list[str], list[str]]:
        using: list[str] = []
        named: list[str] = []
        while self._accept_kw("USING"):
            is_named = self._accept_kw("NAMED")
            (named if is_named else using).append(self._term().value)
        return using, named

    def _quad_block(self, ground: bool = False) -> list:
        """'{' (triples | GRAPH iri-or-var '{' triples '}')* '}' →
        [(graph, TriplePattern)]."""
        self._expect_op("{")
        quads: list = []
        while True:
            kind, v = self._peek()
            if v == "}":
                self._next()
                break
            if self._kw() == "GRAPH":
                self._next()
                gkind, gv = self._peek()
                if gkind == "VAR":
                    self._next()
                    gterm: object = Var(gv[1:])
                else:
                    gterm = self._term()
                    if not isinstance(gterm, IRI):
                        raise ValueError("sparql: GRAPH needs var or IRI")
                self._expect_op("{")
                while self._peek()[1] != "}":
                    for tp in self._triples_same_subject():
                        quads.append((gterm, tp))
                    if not self._accept_op("."):
                        break
                self._expect_op("}")
                self._accept_op(".")
            else:
                for tp in self._triples_same_subject():
                    quads.append((None, tp))
                if not self._accept_op("."):
                    continue
        if ground:
            for g, tp in quads:
                for t in (tp.s, tp.p, tp.o):
                    if isinstance(t, Var):
                        raise ValueError(
                            "sparql: INSERT/DELETE DATA must be ground"
                        )
        return quads

    def _quads_as_group(self, quads: list) -> GroupPattern:
        """DELETE WHERE shorthand: its quad pattern is also the WHERE."""
        group = GroupPattern()
        default_triples: list[TriplePattern] = []
        for g, tp in quads:
            if g is None:
                default_triples.append(tp)
            else:
                group.elements.append(GraphGraphPattern(g, _bgp_group([tp])))
        if default_triples:
            group.elements.insert(0, BGP(default_triples))
        return group


def _bgp_group(triples: list[TriplePattern]) -> GroupPattern:
    g = GroupPattern()
    g.elements.append(BGP(triples))
    return g


def _node_vars(x) -> set:
    """All Var names in an AST fragment (dataclass walk); ExistsExpr
    subtrees are skipped — they are their own scope."""
    import dataclasses as _dc

    out: set = set()

    def walk(n):
        if isinstance(n, Var):
            out.add(n.name)
            return
        if isinstance(n, ExistsExpr):
            return
        if _dc.is_dataclass(n) and not isinstance(n, type):
            for f in _dc.fields(n):
                walk(getattr(n, f.name))
        elif isinstance(n, (list, tuple)):
            for item in n:
                walk(item)

    walk(n := x)
    return out


def _contains_aggregate(x) -> bool:
    import dataclasses as _dc

    if isinstance(x, Aggregate):
        return True
    if _dc.is_dataclass(x) and not isinstance(x, type):
        return any(
            _contains_aggregate(getattr(x, f.name)) for f in _dc.fields(x)
        )
    if isinstance(x, (list, tuple)):
        return any(_contains_aggregate(i) for i in x)
    return False


def _expr_has_aggregate(x) -> bool:
    """Aggregate nodes within ONE expression's own aggregation scope —
    unlike _contains_aggregate this does not descend into EXISTS groups
    or subselects, which form their own scopes where aggregates are
    legal."""
    import dataclasses as _dc

    if isinstance(x, Aggregate):
        return True
    if isinstance(x, (ExistsExpr, SelectQuery, SubSelectPattern)):
        return False
    if _dc.is_dataclass(x) and not isinstance(x, type):
        return any(
            _expr_has_aggregate(getattr(x, f.name)) for f in _dc.fields(x)
        )
    if isinstance(x, (list, tuple)):
        return any(_expr_has_aggregate(i) for i in x)
    return False


def _element_scope_vars(elem) -> set:
    """Vars an element can bind into its group's scope (grammar-level)."""
    if isinstance(elem, (TriplePattern, QuotedPattern)):
        return _node_vars(elem)
    if isinstance(elem, BindPattern):
        return {elem.var.name}
    if isinstance(elem, ValuesPattern):
        return {v.name for v in elem.vars}
    if isinstance(elem, SubSelectPattern):
        q = elem.query
        if q.projections:
            return {
                (alias.name if alias is not None else item.name)
                for item, alias in q.projections
                if alias is not None or isinstance(item, Var)
            }
        return _node_vars(q.where)
    if isinstance(elem, (GroupPattern, OptionalPattern, UnionPattern,
                         GraphGraphPattern, MinusPattern, ServicePattern,
                         BGP)):
        return _node_vars(elem)
    return _node_vars(elem)


def _validate_group(group: GroupPattern) -> None:
    """Grammar-level assignment constraint: the variable a BIND assigns
    must not already be in scope at that point in the group (SPARQL 1.1
    §10.1 note); checked recursively through nested groups."""
    scope: set = set()
    for elem in group.elements:
        if isinstance(elem, BindPattern):
            if elem.var.name in scope:
                raise ValueError(
                    f"sparql: BIND would reassign ?{elem.var.name}, which "
                    "is already in scope in this group"
                )
        for sub in getattr(elem, "__dict__", {}).values():
            if isinstance(sub, GroupPattern):
                _validate_group(sub)
            elif isinstance(sub, SelectQuery):
                _validate_query(sub)
        scope |= _element_scope_vars(elem)
    for f in group.filters:
        if _expr_has_aggregate(f):
            # aggregates are only legal in SELECT expressions, HAVING and
            # ORDER BY — never in a WHERE-clause FILTER
            raise ValueError(
                "sparql: aggregate call in FILTER (only HAVING may "
                "constrain aggregates)"
            )


def _bgp_bnode_sets(node, out: list) -> None:
    """One label set per basic graph pattern. Consecutive BGP elements
    inside one group are merged (FILTERs don't end a BGP, and the
    grammar stores them separately, so splits inside a group are
    conservative join points); OPTIONAL/UNION/GRAPH/MINUS/subquery
    boundaries are real BGP boundaries per SPARQL 1.1 §19.6."""
    from dublin_smart_city_graphdb_spark.model.terms import BNode

    def labels(bgp: BGP) -> set:
        found = set()
        for t in bgp.triples:
            for term in (t.s, t.o):
                if isinstance(term, BNode):
                    found.add(term.label)
        return found

    if isinstance(node, BGP):
        s = labels(node)
        if s:
            out.append(s)
        return
    if isinstance(node, GroupPattern):
        run: set = set()
        for elem in node.elements:
            if isinstance(elem, BGP):
                run |= labels(elem)
            else:
                if run:
                    out.append(run)
                    run = set()
                _bgp_bnode_sets(elem, out)
        if run:
            out.append(run)
        return
    if isinstance(node, UnionPattern):
        for b in node.branches:
            _bgp_bnode_sets(b, out)
        return
    if isinstance(node, SubSelectPattern):
        _bgp_bnode_sets(node.query.where, out)
        return
    group = getattr(node, "group", None)
    if isinstance(group, GroupPattern):
        _bgp_bnode_sets(group, out)


def _check_bnode_reuse(where: GroupPattern) -> None:
    """A blank node label may appear in only ONE basic graph pattern
    (SPARQL 1.1 §19.6) — reuse across UNION branches, OPTIONAL groups,
    GRAPH bodies etc. is a syntax error."""
    sets: list = []
    _bgp_bnode_sets(where, sets)
    seen: set = set()
    for s in sets:
        dup = seen & s
        if dup:
            label = sorted(dup)[0]
            raise ValueError(
                f"sparql: blank node label _:{label} is used in two "
                "different basic graph patterns"
            )
        seen |= s


def _validate_query(q) -> None:
    if hasattr(q, "where") and isinstance(q.where, GroupPattern):
        _check_bnode_reuse(q.where)
    if not isinstance(q, SelectQuery):
        if hasattr(q, "where") and isinstance(q.where, GroupPattern):
            _validate_group(q.where)
        return
    _validate_group(q.where)
    grouped = bool(q.group_by) or q.having or any(
        _contains_aggregate(item) for item, _ in q.projections
    )
    if grouped and not q.projections:
        # SELECT * projects every in-scope variable, which a grouped query
        # cannot do (each projection must be a group key or aggregate)
        raise ValueError("sparql: SELECT * cannot be used with GROUP BY")
    seen_names: set[str] = set()
    for item, alias in q.projections:
        name = alias.name if alias is not None else (
            item.name if isinstance(item, Var) else None
        )
        if name is None:
            continue
        if name in seen_names:
            # 18.2.4.4: each (expr AS ?x) must bind a FRESH variable —
            # a duplicate projection name is a syntax-level error
            raise ValueError(
                f"sparql: ?{name} is assigned or projected twice in the "
                "SELECT clause"
            )
        if alias is not None and any(
            name in _element_scope_vars(e) for e in q.where.elements
        ):
            # 18.2.4.4 second clause: the AS target must also be fresh
            # with respect to the WHERE pattern's IN-SCOPE variables
            # (round 9 — found by syn-neg-select-alias-shadows;
            # _element_scope_vars keeps subselect-hidden vars out)
            raise ValueError(
                f"sparql: (expr AS ?{name}) shadows a variable already"
                " in scope in the WHERE pattern"
            )
        seen_names.add(name)
    if grouped and q.projections:
        # with GROUP BY, bare projections must be group keys; with only
        # aggregates (implicit single group, spec 18.2.4.1) NO bare
        # variable projection is legal
        group_vars = set()
        for g in q.group_by:
            if isinstance(g, Var):
                group_vars.add(g.name)
            elif isinstance(g, tuple) and g[1] is not None:
                group_vars.add(g[1].name)
        for item, alias in q.projections:
            if isinstance(item, Var) and alias is None \
                    and item.name not in group_vars:
                raise ValueError(
                    f"sparql: ?{item.name} is projected but neither "
                    "grouped nor aggregated"
                )


def parse_query(text: str):
    q = SparqlParser(text).parse()
    _validate_query(q)
    return q


def parse_update(text: str) -> list:
    return SparqlParser(text).parse_update()
