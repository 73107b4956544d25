LOAD SILENT <file:///nonexistent/w3c-load-missing.ttl>
