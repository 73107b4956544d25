PREFIX : <http://example/>
DELETE { ?s :status :Old } INSERT { ?s :status :New }
WHERE { ?s :status ?any }
