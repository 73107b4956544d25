PREFIX : <http://example/>
INSERT { _:x :tag ?s } WHERE { ?s :status :Old }
