ADD DEFAULT TO <http://example/g1>
