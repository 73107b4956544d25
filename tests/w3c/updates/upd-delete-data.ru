PREFIX : <http://example/>
DELETE DATA { :a :status :Old }
