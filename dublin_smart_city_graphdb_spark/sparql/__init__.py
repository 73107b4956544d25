"""SPARQL 1.1 front-end: tokenizer → recursive-descent parser → algebra AST →
DataFrame compiler (SURVEY.md §3 E1 pipeline).

The compiler emits declarative DataFrame plans; Catalyst does join selection,
filter pushdown, and column pruning (SURVEY.md §4.1). Custom pieces
(SURVEY.md §4.2): SPARQL-specific join compatibility for unbound variables,
FILTER error→drop semantics, RDF term total ordering, BGP join-order
heuristic, and driver-side fixpoints for property paths.
"""

from dublin_smart_city_graphdb_spark.sparql.parser import parse_query

__all__ = ["parse_query"]
