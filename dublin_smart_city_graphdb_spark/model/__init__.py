"""Canonical RDF data model (SURVEY.md §1.5, FIXTURES.md §A)."""

from dublin_smart_city_graphdb_spark.model.terms import (
    RDF,
    RDFS,
    XSD,
    BNode,
    IRI,
    Literal,
    Term,
)
from dublin_smart_city_graphdb_spark.model.schema import (
    KIND_BLANK,
    KIND_IRI,
    KIND_LITERAL,
    QUAD_SCHEMA,
    TERM_FIELDS,
)

__all__ = [
    "Term", "IRI", "BNode", "Literal", "RDF", "RDFS", "XSD",
    "QUAD_SCHEMA", "TERM_FIELDS", "KIND_IRI", "KIND_BLANK", "KIND_LITERAL",
]
