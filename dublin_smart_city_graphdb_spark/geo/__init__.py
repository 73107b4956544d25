"""Row-level computational-geometry kernels (GeoSPARQL §8.7-8.8
non-topological functions). Driven from SPARQL through Arrow-batched
pandas UDFs — per-row geometry work, map-only, no shuffle — while the
hot-path topological PREDICATES stay JVM Column kernels
(sparql/extensions.py)."""
