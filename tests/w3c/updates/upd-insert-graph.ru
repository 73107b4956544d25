PREFIX : <http://example/>
INSERT DATA { GRAPH <http://example/g1> { :x :p :y } }
