"""Deterministic RDF fixture generator (FIXTURES.md §A, seed 42).

Recreates the reference's data model: the 5 committee areas
(``areas.ttl:12-30``), the 12 facility-type instances
(``facilities.ttl:43-77``), the ontology axioms with domain/range
declarations (``facilities.ttl:26-36,108-184``), and N synthetic facility
instances matching the record shape of the absent bulk file
(``.MISSING_LARGE_BLOBS``, SURVEY.md §1.3) — emitted as Turtle text so the
load path exercises our parser end-to-end.

Guarantees required by the golden queries (FIXTURES.md §A.2):
- no facility of type Park in ex:NorthWest → golden query 2
  (``facilities.ttl:195-202``) returns exactly one area;
- ≥ 50 facilities inside the bounding box lat ∈ (53.34, 53.36),
  lon ∈ (−6.27, −6.25) → golden query 4 (``facilities.ttl:211-218``)
  is non-trivial.
"""

from __future__ import annotations

import random
import uuid

EX = "http://example.org/dcc/facilities#"
SCHEMA = "http://schema.org/"
GEO = "http://www.opengis.net/ont/geosparql#"

AREAS = {
    "NorthCentral": ("North Central Area Committee", "NORTH CENTRAL"),
    "NorthWest": ("North West Area Committee", "NORTH WEST"),
    "Central": ("Central Area Committee", "CENTRAL"),
    "SouthCentral": ("South Central Area Committee", "SOUTH CENTRAL"),
    "SouthEast": ("South East Area Committee", "SOUTH EAST"),
}

FACILITY_TYPES = [
    "Park", "Library", "Toilet", "BikeParking", "CommunityCentre",
    "WaterFountain", "PublicBin", "RecyclingCentre", "GardaStation",
    "DisabledParking", "SwimmingPool", "PlaceOfWorship",
]

# Skewed type mix (FIXTURES.md §A.2): exercises group-by skew + broadcast.
_TYPE_WEIGHTS = {
    "PublicBin": 0.30, "BikeParking": 0.20, "Park": 0.15, "Toilet": 0.10,
}
_OTHER_TYPES = [t for t in FACILITY_TYPES if t not in _TYPE_WEIGHTS]

SOURCES = ["parks.csv", "libraries.csv", "amenities.csv"]

_PROLOGUE = f"""@prefix ex: <{EX}> .
@prefix schema: <{SCHEMA}> .
@prefix geo: <{GEO}> .
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
"""


def ontology_ttl() -> str:
    """Class + property axioms (domain/range feed the RDFS-Plus rules)."""
    lines = [_PROLOGUE]
    for cls in ("Facility", "FacilityType", "CommitteeArea"):
        lines.append(f"ex:{cls} a owl:Class ; rdfs:label \"{cls}\" .")
    object_props = [
        ("hasFacilityType", "Facility", "FacilityType"),
        ("inCommitteeArea", "Facility", "CommitteeArea"),
    ]
    for p, dom, rng in object_props:
        lines.append(
            f"ex:{p} a owl:ObjectProperty ; rdfs:domain ex:{dom} ; rdfs:range ex:{rng} ."
        )
    data_props = [
        ("facilityId", "xsd:string"),
        ("sourceDataset", "xsd:string"),
        ("latitude", "xsd:decimal"),
        ("longitude", "xsd:decimal"),
    ]
    for p, rng in data_props:
        lines.append(
            f"ex:{p} a owl:DatatypeProperty ; rdfs:domain ex:Facility ; rdfs:range {rng} ."
        )
    for t in FACILITY_TYPES:
        lines.append(f"ex:{t} a ex:FacilityType ; rdfs:label \"{t}\" .")
    return "\n".join(lines) + "\n"


def areas_ttl() -> str:
    lines = [_PROLOGUE]
    for key, (label, name) in AREAS.items():
        lines.append(
            f"ex:{key} a ex:CommitteeArea ;\n"
            f"    rdfs:label \"{label}\"@en ;\n"
            f"    schema:name \"{name}\" ."
        )
    return "\n".join(lines) + "\n"


def _pick_type(rng: random.Random) -> str:
    r = rng.random()
    acc = 0.0
    for t, w in _TYPE_WEIGHTS.items():
        acc += w
        if r < acc:
            return t
    return _OTHER_TYPES[rng.randrange(len(_OTHER_TYPES))]


def facilities_ttl(n: int = 2000, seed: int = 42) -> str:
    """Synthetic facility instances (≈ 11–12 triples each)."""
    rng = random.Random(seed)
    area_keys = list(AREAS)
    lines = [_PROLOGUE]
    for i in range(n):
        ftype = _pick_type(rng)
        area = area_keys[rng.randrange(5)]
        if ftype == "Park" and area == "NorthWest":
            area = "NorthCentral"  # golden-query-2 holdout
        if i < 60:
            # Deterministic in-bbox block for golden query 4.
            lat = round(53.345 + i * 0.0002, 6)
            lon = round(-6.266 + i * 0.0002, 6)
        else:
            lat = round(rng.uniform(53.20, 53.45), 6)
            lon = round(rng.uniform(-6.45, -6.05), 6)
        fid = uuid.UUID(int=rng.getrandbits(128), version=4)
        src = SOURCES[rng.randrange(3)]
        dublin_no = 1 + rng.randrange(24)
        lines.append(
            f"ex:facility_{i:05d} a ex:Facility ;\n"
            f"    ex:hasFacilityType ex:{ftype} ;\n"
            f"    ex:inCommitteeArea ex:{area} ;\n"
            f"    ex:facilityId \"{fid}\" ;\n"
            f"    ex:sourceDataset \"{src}\" ;\n"
            f"    schema:name \"Facility {i} {ftype}\" ;\n"
            f"    schema:address \"{i} Example Street, Dublin {dublin_no}\" ;\n"
            + (
                f"    schema:url \"https://dublin.example/f/{i}\"^^xsd:anyURI ;\n"
                if rng.random() < 0.30
                else ""
            )
            + f"    ex:latitude {lat} ;\n"
            f"    ex:longitude {lon} ;\n"
            f"    geo:hasGeometry ex:geom_{i:05d} .\n"
            f"ex:geom_{i:05d} geo:asWKT \"POINT({lon} {lat})\"^^geo:wktLiteral ."
        )
    return "\n".join(lines) + "\n"


def full_fixture_ttl(n: int = 2000, seed: int = 42) -> str:
    return ontology_ttl() + areas_ttl() + facilities_ttl(n, seed)
