"""DataFrame operators: frontier state, seen-set dedup, politeness
scheduling, sitemap/index sinks, offline queries, training-data ops."""
