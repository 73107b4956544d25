CLEAR SILENT GRAPH <http://example/nosuch>
