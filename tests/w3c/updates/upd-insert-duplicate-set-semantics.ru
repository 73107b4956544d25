PREFIX : <http://example/>
INSERT DATA { :a :status :Old }
