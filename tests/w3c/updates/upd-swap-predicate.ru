PREFIX : <http://example/>
DELETE { ?s :status :Old }
INSERT { ?s :status :Archived }
WHERE { ?s :status :Old }
