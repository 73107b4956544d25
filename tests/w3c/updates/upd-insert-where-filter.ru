PREFIX : <http://example/>
INSERT { ?s :flag :High } WHERE { ?s :score ?v . FILTER(?v > 1) }
