PREFIX : <http://example/>
INSERT DATA { :z :status :Old } ;
DELETE DATA { :a :score 1 }
