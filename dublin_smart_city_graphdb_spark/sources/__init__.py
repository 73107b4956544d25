"""Sources & sinks: Turtle/N-Triples ingestion, the Parquet quad store,
repository catalog, and SPARQL-results serialization (SURVEY.md §2.1)."""
