"""Graph-analytics primitives (SURVEY.md §2.2 P7, §2.8 closure rules, M6).

Catalyst has no recursion, so transitive closure / property paths / connected
components are driver-orchestrated loops of DataFrame joins with checkpoint
hygiene — the SURVEY §4.2(3) design. GraphFrames is not available in this
environment; these primitives are self-contained DataFrame algorithms.
"""

from dublin_smart_city_graphdb_spark.graph.closure import (
    connected_components,
    transitive_closure,
)

__all__ = ["transitive_closure", "connected_components"]
