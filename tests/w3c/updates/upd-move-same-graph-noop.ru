MOVE GRAPH <http://example/g1> TO <http://example/g1>
