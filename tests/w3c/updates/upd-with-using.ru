PREFIX : <http://example/>
WITH <http://example/g1> DELETE { ?s :p ?o } USING <http://example/g2> WHERE { ?s ?p ?o }
