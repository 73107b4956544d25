PREFIX : <http://example/>
DELETE { ?s :score ?v } INSERT { ?s :score ?v } WHERE { ?s :score ?v }
