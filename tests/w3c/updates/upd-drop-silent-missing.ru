DROP SILENT GRAPH <http://example/missing>
