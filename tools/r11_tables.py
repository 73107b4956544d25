"""Merge the round-11 before/after profile JSONs into per-family
markdown tables and splice them into OPTIMIZATION_r11.md at the
``<!-- AFTER-TABLES -->`` marker.

Usage: python tools/r11_tables.py BEFORE_JSON AFTER_JSON
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]

FAMILIES = [
    ("Inference / rulesets", lambda n: n.startswith("inference_")
     or n in ("shacl_enforce_commit",)
     or n.startswith("sparql_owl") or n == "sparql_custom_ruleset"),
    ("Geo SPARQL", lambda n: n.startswith("sparql_geo_") or n == "geo_haversine"),
    ("SHACL / similarity / plugins", lambda n: n.startswith("sparql_shacl")
     or n in ("sparql_similarity", "sparql_rdf_rank", "sparql_autocomplete",
              "sparql_fts_bm25", "sparql_predicate_stats",
              "sparql_class_counts", "sparql_service_http_federation",
              "property_table_roundtrip")),
    ("SPARQL gate (BGP/paths/forms)", lambda n: n.startswith("sparql_")),
    ("Dedup", lambda n: n.startswith("dedup_") or n in
     ("chunk_dup_rate", "corpus_chunk_dedup", "corpus_dedup_report")),
    ("Similarity / ANN / embeddings", lambda n: n.startswith("ann_")
     or n.startswith("embed") or n.startswith("kmeans")
     or n == "embedding_cosine_pairs"),
    ("Text / LM / curation", lambda n: n.startswith("text_")
     or n.startswith("corpus_") or n.startswith("sample_")
     or n in ("decontaminate_probe", "shard_by_token_budget", "doc_chunks",
              "source_overlap_matrix", "multimodal_meta",
              "multimodal_frames")),
    ("Events / time-series", lambda n: n.startswith("events_")
     or n in ("skew_salted_agg", "user_activity_features")),
    ("Graph analytics", lambda n: n.startswith("graph_")),
    ("Relational (TPC-H + operators)", lambda n: True),
]


def main() -> None:
    before = json.loads(Path(sys.argv[1]).read_text())["queries"]
    after = json.loads(Path(sys.argv[2]).read_text())["queries"]
    names = sorted(set(before) | set(after))
    groups: dict[str, list[str]] = {}
    for n in names:
        for fam, pred in FAMILIES:
            if pred(n):
                groups.setdefault(fam, []).append(n)
                break

    out = []
    tot_b = tot_a = 0.0
    for fam, _ in FAMILIES:
        members = groups.get(fam, [])
        if not members:
            continue
        members.sort(key=lambda n: -before.get(n, 0))
        fb = sum(before.get(n, 0) for n in members)
        fa = sum(after.get(n, 0) for n in members)
        tot_b += fb
        tot_a += fa
        out.append(f"### {fam} — {fb:.1f} s → {fa:.1f} s")
        out.append("")
        out.append("| entry | before (s) | after (s) | Δ |")
        out.append("|---|---|---|---|")
        for n in members:
            b, a = before.get(n), after.get(n)
            if b is None or a is None:
                continue
            ratio = f"{a / b:.2f}×" if b else "—"
            out.append(f"| {n} | {b:.3f} | {a:.3f} | {ratio} |")
        out.append("")
    out.insert(0, "")
    out.insert(1, f"**Full registry (202 entries, noop-sink sf0.1 "
                  f"best-of-2): {tot_b:.1f} s → {tot_a:.1f} s "
                  f"({tot_a / tot_b:.2f}×).** Per-entry wall at this "
                  "scale carries ±25% session noise; the family sums "
                  "and the deterministic job/task counts in the "
                  "sections above are the load-bearing evidence.")
    out.insert(2, "")

    doc = ROOT / "OPTIMIZATION_r11.md"
    text = doc.read_text()
    marker = "<!-- AFTER-TABLES -->"
    assert marker in text
    doc.write_text(text.replace(marker, "\n".join(out)))
    print(f"total before {tot_b:.1f}s after {tot_a:.1f}s")


if __name__ == "__main__":
    main()
