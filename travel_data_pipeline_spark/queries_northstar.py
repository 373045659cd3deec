"""North-star queries: dedup, similarity search, text analysis,
multimodal plumbing (SURVEY.md §2.10)."""
