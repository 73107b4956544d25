PREFIX : <http://example/>
INSERT DATA { :d :status :New } ;
DELETE DATA { :c :status :New }
