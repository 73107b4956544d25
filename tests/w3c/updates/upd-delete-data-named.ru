PREFIX : <http://example/>
DELETE DATA { GRAPH <http://example/g1> { :a :p :o1 } }
