PREFIX : <http://example/>
DELETE WHERE { ?s :status :Old }
