"""Training-data pipeline operators: deduplication, similarity search,
text analysis, event-stream aggregation, multimodal plumbing.

These extend the engine beyond the reference's own operator set to what a
large-scale training-data pipeline needs over the ``documents`` /
``embeddings`` / ``events`` tables (driver test schema). All hashing is
built from engine-portable primitives (md5 hex, integer modular
arithmetic) so every operator has an exact DuckDB oracle.
"""
