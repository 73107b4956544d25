"""GraphDB path plugin surface: ``path:findPath`` magic predicates.

The deployed GraphDB image (reference ``Dockerfile:2``) ships the
graph-path-search plugin; these tests pin the engine's Spark-native twin
(sparql/compiler.py ``_extract_pathsearch`` over graph/paths.py BFS) on a
hand-checkable diamond-with-tail graph:

    a → b → d → e        a → c → d    (two shortest a→e paths via b or c)
    e → a (back edge)    x → y        (disconnected component)
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def repo(spark):
    from dublin_smart_city_graphdb_spark.engine import Engine

    eng = Engine(spark)
    name = "pathsearch_test"
    if name in eng.list_repositories():
        eng.drop_repository(name)
    r = eng.create_repository(name, ruleset="none")
    r.load_turtle("""
        @prefix ex: <http://x#> .
        ex:a ex:link ex:b , ex:c .
        ex:b ex:link ex:d .
        ex:c ex:link ex:d .
        ex:d ex:link ex:e .
        ex:e ex:link ex:a .
        ex:x ex:link ex:y .
        ex:a ex:other ex:e .
        ex:a ex:label "start" .
    """)
    return r


PFX = """
    PREFIX ex: <http://x#>
    PREFIX path: <urn:spark-graft:path:>
"""


def test_shortest_path_hops_deterministic(repo):
    """a→e shortest path is 3 hops; the b/c tie at hop 0 resolves to the
    lexicographically smaller predecessor (b)."""
    rows = repo.sparql_collect(PFX + """
        SELECT ?s ?e ?i WHERE {
          [] path:findPath path:shortestPath ;
             path:sourceNode ex:a ;
             path:destinationNode ex:e ;
             path:propertyPath ex:link ;
             path:startNode ?s ; path:endNode ?e ;
             path:resultBindingIndex ?i .
        } ORDER BY ?i
    """)
    hops = [(r["s"].lex, r["e"].lex, int(r["i"].lex)) for r in rows]
    assert hops == [
        ("http://x#a", "http://x#b", 0),
        ("http://x#b", "http://x#d", 1),
        ("http://x#d", "http://x#e", 2),
    ]


def test_shortest_path_ignores_other_predicates_when_restricted(repo):
    """Without path:propertyPath the ex:other shortcut a→e wins (1 hop)."""
    rows = repo.sparql_collect(PFX + """
        SELECT ?s ?e ?i WHERE {
          [] path:findPath path:shortestPath ;
             path:sourceNode ex:a ; path:destinationNode ex:e ;
             path:startNode ?s ; path:endNode ?e ;
             path:resultBindingIndex ?i .
        }
    """)
    assert len(rows) == 1
    assert rows[0]["s"].lex == "http://x#a"
    assert rows[0]["e"].lex == "http://x#e"


def test_shortest_path_unreachable_is_empty(repo):
    rows = repo.sparql_collect(PFX + """
        SELECT ?s ?e ?i WHERE {
          [] path:findPath path:shortestPath ;
             path:sourceNode ex:a ; path:destinationNode ex:y ;
             path:propertyPath ex:link ;
             path:startNode ?s ; path:endNode ?e ;
             path:resultBindingIndex ?i .
        }
    """)
    assert rows == []


def test_distance_binding(repo):
    rows = repo.sparql_collect(PFX + """
        SELECT ?d WHERE {
          [] path:findPath path:distance ;
             path:sourceNode ex:a ; path:destinationNode ex:e ;
             path:propertyPath ex:link ;
             path:distanceBinding ?d .
        }
    """)
    assert len(rows) == 1
    assert int(rows[0]["d"].lex) == 3
    assert rows[0]["d"].dtype.endswith("integer")


def test_all_paths_enumerates_both_branches(repo):
    """allPaths a→e within 4 hops: via b and via c, each 3 hops, path
    strings distinguish them; hop rows carry per-path indexes."""
    rows = repo.sparql_collect(PFX + """
        SELECT ?ps ?s ?e ?i WHERE {
          [] path:findPath path:allPaths ;
             path:sourceNode ex:a ; path:destinationNode ex:e ;
             path:propertyPath ex:link ;
             path:maxPathLength 4 ;
             path:startNode ?s ; path:endNode ?e ;
             path:resultBindingIndex ?i ;
             path:pathString ?ps .
        } ORDER BY ?ps ?i
    """)
    paths = sorted({r["ps"].lex for r in rows})
    assert paths == [
        "http://x#a->http://x#b->http://x#d->http://x#e",
        "http://x#a->http://x#c->http://x#d->http://x#e",
    ]
    assert len(rows) == 6  # 2 paths x 3 hops
    first = [r for r in rows if r["ps"].lex == paths[0]]
    assert [(r["s"].lex, r["e"].lex) for r in first] == [
        ("http://x#a", "http://x#b"),
        ("http://x#b", "http://x#d"),
        ("http://x#d", "http://x#e"),
    ]


def test_all_paths_cycle_safe(repo):
    """The e→a back edge creates a cycle; simple-path semantics stop it
    from looping (a→…→e is found once per branch even with maxLen 8)."""
    rows = repo.sparql_collect(PFX + """
        SELECT ?ps WHERE {
          [] path:findPath path:allPaths ;
             path:sourceNode ex:b ; path:destinationNode ex:c ;
             path:propertyPath ex:link ;
             path:maxPathLength 8 ;
             path:startNode ?s ; path:endNode ?e ;
             path:resultBindingIndex ?i ; path:pathString ?ps .
        }
    """)
    # b→d→e→a→c is the only simple path
    assert sorted({r["ps"].lex for r in rows}) == [
        "http://x#b->http://x#d->http://x#e->http://x#a->http://x#c"
    ]


def test_path_bindings_join_rest_of_bgp(repo):
    """Path hop bindings join the surrounding BGP like any other pattern."""
    rows = repo.sparql_collect(PFX + """
        SELECT ?lbl ?e WHERE {
          [] path:findPath path:shortestPath ;
             path:sourceNode ex:a ; path:destinationNode ex:e ;
             path:propertyPath ex:link ;
             path:startNode ?hs ; path:endNode ?e ;
             path:resultBindingIndex ?i .
          ?hs ex:label ?lbl .
        }
    """)
    assert len(rows) == 1  # only hop 0 starts at a labelled node
    assert rows[0]["lbl"].lex == "start"
    assert rows[0]["e"].lex == "http://x#b"


def test_max_path_length_guard(repo):
    with pytest.raises(Exception, match="maxPathLength"):
        repo.sparql_collect(PFX + """
            SELECT ?s WHERE {
              [] path:findPath path:allPaths ;
                 path:sourceNode ex:a ; path:destinationNode ex:e ;
                 path:maxPathLength 99 ;
                 path:startNode ?s ; path:endNode ?e ;
                 path:resultBindingIndex ?i .
            }
        """)


def test_source_must_be_bound(repo):
    with pytest.raises(Exception, match="sourceNode"):
        repo.sparql_collect(PFX + """
            SELECT ?s WHERE {
              [] path:findPath path:shortestPath ;
                 path:sourceNode ?src ; path:destinationNode ex:e ;
                 path:startNode ?s ; path:endNode ?e ;
                 path:resultBindingIndex ?i .
            }
        """)
