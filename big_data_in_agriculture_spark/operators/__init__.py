"""Engine operators: mart pipelines, serving queries, relational surface,
dedup, similarity search, multimodal plumbing."""
