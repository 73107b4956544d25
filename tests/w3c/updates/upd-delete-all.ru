PREFIX : <http://example/>
DELETE WHERE { ?s ?p ?o }
