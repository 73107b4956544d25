"""Term-struct column helpers: every SPARQL variable is carried through the
compiled DataFrame plan as one struct column (kind, lex, dtype, lang, num,
ts, bool) — model/schema.py TERM_FIELDS.

Term identity = (kind, lex, dtype, lang); the shadow fields are derived from
(lex, dtype) at load, so whole-struct equality (verified: Spark struct
equality is null-safe per field) is exactly RDF term identity — one narrow
join key per shared variable, JVM-side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

from dublin_smart_city_graphdb_spark.model.schema import (
    KIND_BLANK,
    KIND_IRI,
    KIND_LITERAL,
    KIND_TRIPLE,
)
from dublin_smart_city_graphdb_spark.model.terms import (
    XSD,
    BNode,
    IRI,
    Literal,
    QuotedTriple,
    Term,
)

_DEC = "decimal(38,10)"


def _struct(kind, lex, dtype, lang, num, ts, boolean) -> Column:
    return F.struct(
        kind.cast("tinyint").alias("kind"),
        lex.cast("string").alias("lex"),
        dtype.cast("string").alias("dtype"),
        lang.cast("string").alias("lang"),
        num.cast(_DEC).alias("num"),
        ts.cast("timestamp").alias("ts"),
        boolean.cast("boolean").alias("bool"),
    )


def _NULL_S() -> Column:
    return F.lit(None).cast("string")


def _NULL_N() -> Column:
    return F.lit(None).cast(_DEC)


def _NULL_T() -> Column:
    return F.lit(None).cast("timestamp")


def _NULL_B() -> Column:
    return F.lit(None).cast("boolean")


def subject_struct(col: Column) -> Column:
    """s/p/g positions hold IRIs, blank labels (``_:``) or — RDF-star —
    quoted-triple text (``<< ``)."""
    kind = (
        F.when(col.startswith("_:"), F.lit(KIND_BLANK))
        .when(col.startswith("<< "), F.lit(KIND_TRIPLE))
        .otherwise(F.lit(KIND_IRI))
    )
    return _struct(kind, col, _NULL_S(), _NULL_S(), _NULL_N(), _NULL_T(), _NULL_B())


def object_struct(df_prefix: str = "") -> Column:
    p = df_prefix
    return _struct(
        F.col(p + "o_kind"), F.col(p + "o_lex"), F.col(p + "o_dtype"),
        F.col(p + "o_lang"), F.col(p + "o_num"), F.col(p + "o_ts"),
        F.col(p + "o_bool"),
    )


def const_struct(term: Term) -> Column:
    if isinstance(term, QuotedTriple):
        return _struct(F.lit(KIND_TRIPLE), F.lit(str(term)), _NULL_S(),
                       _NULL_S(), _NULL_N(), _NULL_T(), _NULL_B())
    if isinstance(term, IRI):
        return _struct(F.lit(KIND_IRI), F.lit(term.value), _NULL_S(), _NULL_S(),
                       _NULL_N(), _NULL_T(), _NULL_B())
    if isinstance(term, BNode):
        return _struct(F.lit(KIND_BLANK), F.lit(f"_:{term.label}"), _NULL_S(),
                       _NULL_S(), _NULL_N(), _NULL_T(), _NULL_B())
    lit: Literal = term
    num = lit.numeric_value()
    ts = lit.timestamp_value()
    b = lit.boolean_value()
    return _struct(
        F.lit(KIND_LITERAL), F.lit(lit.lex), F.lit(lit.datatype),
        F.lit(lit.lang),
        F.lit(num).cast(_DEC) if num is not None else _NULL_N(),
        F.lit(ts) if ts is not None else _NULL_T(),
        F.lit(b) if b is not None else _NULL_B(),
    )


def null_struct() -> Column:
    return _struct(F.lit(None).cast("tinyint"), _NULL_S(), _NULL_S(), _NULL_S(),
                   _NULL_N(), _NULL_T(), _NULL_B())


def object_const_filter(term: Term) -> Column:
    """Constant-object pattern match as PER-COLUMN predicates on the quads
    table (term identity = kind+lex+dtype+lang). Column-wise comparisons
    reach the parquet scan as pushed filters with row-group min/max pruning;
    a whole-struct equality would not push down."""
    if isinstance(term, QuotedTriple):
        return (F.col("o_kind") == KIND_TRIPLE) & (
            F.col("o_lex") == str(term)
        )
    if isinstance(term, IRI):
        return (F.col("o_kind") == KIND_IRI) & (F.col("o_lex") == term.value)
    if isinstance(term, BNode):
        return (F.col("o_kind") == KIND_BLANK) & (
            F.col("o_lex") == f"_:{term.label}"
        )
    lit: Literal = term
    cond = (F.col("o_kind") == KIND_LITERAL) & (F.col("o_lex") == lit.lex)
    cond &= (
        (F.col("o_dtype") == lit.datatype)
        if lit.datatype
        else F.col("o_dtype").isNull()
    )
    cond &= (
        (F.col("o_lang") == lit.lang) if lit.lang else F.col("o_lang").isNull()
    )
    return cond


# -- constructors from computed values --------------------------------------

def make_numeric(col: Column, dtype: str = XSD + "decimal") -> Column:
    """Numeric result → typed literal struct (lex mirrors the value).
    Decimal lexical forms are canonical xsd:decimal: trailing zeros trimmed,
    one fractional digit kept ("2.0", "3.5" — not "3.5000000000")."""
    if dtype == XSD + "integer":
        lex = col.cast("decimal(38,0)").cast("string")
    else:
        lex = col.cast("string")
        lex = F.regexp_replace(lex, r"(\.\d*?)0+$", r"$1")
        lex = F.regexp_replace(lex, r"\.$", ".0")
    return _struct(
        F.when(col.isNull(), F.lit(None)).otherwise(F.lit(KIND_LITERAL)),
        lex,
        F.when(col.isNull(), _NULL_S()).otherwise(F.lit(dtype)),
        _NULL_S(), col, _NULL_T(), _NULL_B(),
    )


def make_string(col: Column) -> Column:
    return _struct(
        F.when(col.isNull(), F.lit(None)).otherwise(F.lit(KIND_LITERAL)),
        col, _NULL_S(), _NULL_S(), _NULL_N(), _NULL_T(), _NULL_B(),
    )


def make_bool(col: Column) -> Column:
    # Null input = SPARQL error: EVERY field must stay null — a bare
    # .otherwise() would stamp lex "false" / num 0 onto error structs,
    # which ebv() then misreads as a bound false (caught by the W3C
    # slice's IF-error case).
    return _struct(
        F.when(col.isNull(), F.lit(None)).otherwise(F.lit(KIND_LITERAL)),
        F.when(col, F.lit("true")).when(~col, F.lit("false")),
        F.when(col.isNull(), _NULL_S()).otherwise(F.lit(XSD + "boolean")),
        _NULL_S(),
        F.when(col, F.lit(1)).when(~col, F.lit(0)).cast(_DEC),
        _NULL_T(), col,
    )


def make_iri(col: Column) -> Column:
    return _struct(
        F.when(col.isNull(), F.lit(None)).otherwise(F.lit(KIND_IRI)),
        col, _NULL_S(), _NULL_S(), _NULL_N(), _NULL_T(), _NULL_B(),
    )


def make_ts(col: Column) -> Column:
    return _struct(
        F.when(col.isNull(), F.lit(None)).otherwise(F.lit(KIND_LITERAL)),
        F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss"),
        F.when(col.isNull(), _NULL_S()).otherwise(F.lit(XSD + "dateTime")),
        _NULL_S(), _NULL_N(), col, _NULL_B(),
    )


# -- accessors ---------------------------------------------------------------

def ebv(term: Column) -> Column:
    """SPARQL effective boolean value; null = type error (row dropped by
    FILTER, which is exactly SPARQL's error semantics)."""
    return (
        F.when(term.isNull(), F.lit(None).cast("boolean"))
        .when(term["bool"].isNotNull(), term["bool"])
        .when(term["num"].isNotNull(), term["num"] != 0)
        .when(
            (term["kind"] == KIND_LITERAL)
            & (term["dtype"].isNull() | (term["dtype"] == XSD + "string")),
            F.length(term["lex"]) > 0,
        )
        .otherwise(F.lit(None).cast("boolean"))
    )


def sort_keys(term: Column) -> list[Column]:
    """RDF term total order (SURVEY §2.5 M2): unbound < blank < IRI <
    literal; literals by numeric/temporal/lexical value."""
    rank = (
        F.when(term.isNull() | term["kind"].isNull(), 0)
        .when(term["kind"] == KIND_BLANK, 1)
        .when(term["kind"] == KIND_IRI, 2)
        .otherwise(3)
    )
    return [rank, term["num"], term["ts"], term["bool"].cast("int"), term["lex"]]


# -- RDF-star (quoted triples as terms) --------------------------------------

def quoted_subject_struct(col: Column) -> Column:
    """s-position struct that also recognizes quoted-triple subjects
    (lex starts ``<< ``) alongside IRIs and blank labels."""
    kind = (
        F.when(col.startswith("<< "), F.lit(KIND_TRIPLE))
        .when(col.startswith("_:"), F.lit(KIND_BLANK))
        .otherwise(F.lit(KIND_IRI))
    )
    return _struct(kind, col, _NULL_S(), _NULL_S(), _NULL_N(), _NULL_T(),
                   _NULL_B())


def quoted_component(col: Column, k: int) -> Column:
    """Extract component k (1=subject, 2=predicate, 3=object) of a quoted
    triple's canonical text — nesting-aware (round 9: the old regex
    required a whitespace-free subject, so SUBJECT() of a NESTED quoted
    subject like ``<< << :a :p :b >> :cert 0.9 >>`` failed; found by the
    W3C-star slice). Pure JVM expression: tokenize the inner text on
    single spaces, walk ``<<``/``>>`` depth to find where the subject
    ends (one token, or a balanced block), take the next token as the
    predicate (always IRI/bnode), and rejoin the remainder as the object
    (so literals with spaces and nested quoted objects survive —
    split+join on the same separator is lossless). Known corner: a
    literal whose TEXT contains a lone ``<<``/``>>`` token corrupts the
    depth walk; canonical engine serializations never emit one outside a
    quoted string. Non-quoted input yields '' (the old regex contract)."""
    inner = col.substr(F.lit(4), F.length(col) - 6)
    tokens = F.split(inner, " ")
    delta = lambda t: (  # noqa: E731 — local token weight
        F.when(t == "<<", F.lit(1)).when(t == ">>", F.lit(-1)).otherwise(
            F.lit(0)
        )
    )
    # token count of the subject: 1 for a plain term, else the prefix
    # length where << / >> depth first returns to zero
    subj_n = F.when(F.element_at(tokens, 1) != "<<", F.lit(1)).otherwise(
        F.aggregate(
            tokens,
            F.struct(
                F.lit(0).alias("d"), F.lit(0).alias("i"),
                F.lit(0).alias("n"),
            ),
            lambda acc, t: F.struct(
                (acc["d"] + delta(t)).alias("d"),
                (acc["i"] + 1).alias("i"),
                F.when(
                    (acc["n"] == 0) & ((acc["d"] + delta(t)) == 0),
                    acc["i"] + 1,
                ).otherwise(acc["n"]).alias("n"),
            ),
        )["n"]
    )
    if k == 1:
        out = F.array_join(F.slice(tokens, F.lit(1), subj_n), " ")
    elif k == 2:
        out = F.element_at(tokens, subj_n + 1)
    else:
        out = F.array_join(
            F.slice(
                tokens, subj_n + 2,
                F.greatest(F.lit(0), F.size(tokens) - subj_n - 1),
            ),
            " ",
        )
    return F.when(col.rlike(r"^<< .* >>$"), out).otherwise(F.lit(""))


def nt_text_to_struct(col: Column) -> Column:
    """Canonical N-Triples(-star) component text → term struct: the inverse
    of the quoted serialization, entirely JVM expression code. Rebuilds the
    numeric/temporal/boolean shadow fields for typed literals so extracted
    components compare by VALUE like any loaded term."""
    is_iri = col.startswith("<")
    is_bn = col.startswith("_:")
    is_qt = col.startswith("<< ")
    is_lit = col.startswith('"')
    lex_raw = F.regexp_extract(col, r'^"((?:[^"\\]|\\.)*)"', 1)
    # unescape \" \n \r \t then \\ (order matters: backslash last)
    lex = F.regexp_replace(lex_raw, r'\\"', '"')
    lex = F.regexp_replace(lex, r"\\n", "\n")
    lex = F.regexp_replace(lex, r"\\r", "\r")
    lex = F.regexp_replace(lex, r"\\t", "\t")
    lex = F.regexp_replace(lex, r"\\\\", r"\\")
    lang = F.nullif(F.regexp_extract(col, r'"@([A-Za-z][A-Za-z0-9-]*)$', 1), F.lit(""))
    dtype = F.nullif(F.regexp_extract(col, r"\^\^<([^>]*)>$", 1), F.lit(""))
    num = F.when(
        dtype.isin(
            XSD + "integer", XSD + "decimal", XSD + "double", XSD + "float",
            XSD + "int", XSD + "long",
        ),
        lex.try_cast(_DEC),
    )
    ts = F.when(dtype == XSD + "dateTime", lex.try_cast("timestamp"))
    b = F.when(dtype == XSD + "boolean", lex.try_cast("boolean"))
    kind = (
        F.when(col.isNull() | (col == ""), F.lit(None).cast("tinyint"))
        .when(is_qt, F.lit(KIND_TRIPLE))
        .when(is_iri, F.lit(KIND_IRI))
        .when(is_bn, F.lit(KIND_BLANK))
        .otherwise(F.lit(KIND_LITERAL))
    )
    out_lex = (
        F.when(is_qt, col)
        .when(is_iri, F.regexp_replace(col, r"^<|>$", ""))
        .when(is_bn, col)
        .otherwise(lex)
    )
    return _struct(
        kind, out_lex,
        F.when(is_lit, dtype),
        F.when(is_lit, lang),
        F.when(is_lit, num).otherwise(_NULL_N()),
        F.when(is_lit, ts).otherwise(_NULL_T()),
        F.when(is_lit, b).otherwise(_NULL_B()),
    )
