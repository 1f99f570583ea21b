"""Index implementations: dense HNSW, flat, sparse inverted, TF-IDF/BM25."""
