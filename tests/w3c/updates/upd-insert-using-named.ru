PREFIX : <http://example/>
INSERT { ?s :seen :yes } USING NAMED <http://example/g2>
WHERE { GRAPH ?g { ?s ?p ?o } }
