"""Training-data pipeline operators: deduplication, similarity search,
text analysis, multimodal plumbing (builder brief: first-class at
100 TB scale alongside SURVEY.md §2)."""
