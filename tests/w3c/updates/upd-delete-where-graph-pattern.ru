PREFIX : <http://example/>
DELETE WHERE { GRAPH <http://example/g1> { ?s :p ?o } }
