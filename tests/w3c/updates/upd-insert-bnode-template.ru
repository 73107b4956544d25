PREFIX : <http://example/>
INSERT { ?s :tag _:b } WHERE { ?s :status :New }
