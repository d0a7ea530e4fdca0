"""Spark operators: the Arrow-batched extraction stage plus the relational
operator surface (dedup, similarity, text stats) built on DataFrame ops."""
