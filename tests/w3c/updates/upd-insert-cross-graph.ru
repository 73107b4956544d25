PREFIX : <http://example/>
INSERT { GRAPH <http://example/g2> { ?s :copied true } }
WHERE { ?s :status :Old }
