PREFIX : <http://example/>
INSERT { GRAPH <http://example/g2> { ?s :flag :Seen } }
WHERE { GRAPH <http://example/g1> { ?s :p ?o } }
