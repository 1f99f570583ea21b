"""Service/runtime layer: collections, transactions, indexing manager."""
