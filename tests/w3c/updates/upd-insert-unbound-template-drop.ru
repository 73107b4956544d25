PREFIX : <http://example/>
INSERT { ?s :scored ?v } WHERE { ?s :status ?st . OPTIONAL { ?s :score ?v } }
