PREFIX : <http://example/>
DELETE DATA { << :s :score 5 >> :source :web }
