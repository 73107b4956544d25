PREFIX : <http://example/>
INSERT { GRAPH ?g { ?s :copied :yes } } WHERE { GRAPH ?g { ?s :p ?o } }
