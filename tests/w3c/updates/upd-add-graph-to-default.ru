ADD <http://example/g1> TO DEFAULT
