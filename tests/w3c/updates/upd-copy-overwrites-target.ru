COPY GRAPH <http://example/g1> TO <http://example/g2>
