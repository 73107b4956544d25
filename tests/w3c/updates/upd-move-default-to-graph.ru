MOVE DEFAULT TO <http://example/gx>
