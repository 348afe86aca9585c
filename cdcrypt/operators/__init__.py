"""DataFrame-level operators: field crypto transform, CDC dedup/LWW,
salted MERGE upsert, document dedup family, similarity search."""
