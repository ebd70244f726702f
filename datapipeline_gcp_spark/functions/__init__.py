"""Beyond-parity column logic (BASELINE.json north star): text analysis,
deduplication, embedding similarity, and multimodal-column plumbing —
the operators a large-scale training-data pipeline needs, each designed
for 100 TB (built-in column functions in the hot path, blocking instead
of quadratic cross joins, Arrow-vectorized UDFs only where built-ins
cannot express the semantics)."""
