"""LLM-data-pipeline operators: dedup, similarity search, text analysis,
multimodal columns (BASELINE.json north star; SURVEY.md §2.2 extensions)."""
