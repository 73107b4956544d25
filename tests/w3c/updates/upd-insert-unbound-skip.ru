PREFIX : <http://example/>
INSERT { ?s :bonus ?b } WHERE { ?s :score ?v . OPTIONAL { ?s :missing ?b } }
