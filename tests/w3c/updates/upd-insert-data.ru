PREFIX : <http://example/>
INSERT DATA { :d :status :New }
