PREFIX : <http://example/>
WITH <http://example/g1> INSERT { ?s :flag :on } WHERE { ?s :p ?o }
