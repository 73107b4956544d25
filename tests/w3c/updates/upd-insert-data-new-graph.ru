PREFIX : <http://example/>
INSERT DATA { GRAPH <http://example/gnew> { :z :p :w } }
