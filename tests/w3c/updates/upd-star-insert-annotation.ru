PREFIX : <http://example/>
INSERT DATA { :s :score 5 {| :source :web |} }
