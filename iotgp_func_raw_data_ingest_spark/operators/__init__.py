"""Engine operators: ingest pipeline, dedup, similarity, text analysis,
multimodal column handling."""
