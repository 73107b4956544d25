"""dublin_smart_city_graphdb_spark — a PySpark-native RDF/SPARQL analytics engine.

A from-scratch re-expression of the capability surface of the reference
deployment ``singlasuhani/dublin-smart-city-graphdb`` (an Ontotext GraphDB
10.7.2 Docker harness; see SURVEY.md) as an idiomatic PySpark engine:

- one canonical ``quads`` DataFrame (SURVEY.md §1.5) stored as Parquet
  partitioned by predicate (the predicate-lists analogue,
  ``init-graphdb.sh:61-65`` in the reference),
- a SPARQL 1.1 parser + algebra compiler that emits DataFrame plans and lets
  Catalyst/Tungsten pick physical strategy,
- load-time RDFS-Plus forward-chaining materialization
  (``init-graphdb.sh:51-55``),
- plus a large-scale training-data-pipeline extension surface (dedup,
  similarity search, text analysis, multimodal columns, streaming).
"""

from dublin_smart_city_graphdb_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
