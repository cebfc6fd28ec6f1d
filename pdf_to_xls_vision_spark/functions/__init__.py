"""Training-data-pipeline function library: portable hashing,
deduplication, similarity search, text analysis, multimodal plumbing."""
