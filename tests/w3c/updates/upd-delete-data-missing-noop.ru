PREFIX : <http://example/>
DELETE DATA { :zzz :status :Old . }
