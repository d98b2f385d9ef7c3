"""Scalar/column function library (SURVEY.md §2.8) + training-data ops:
text analysis, deduplication, similarity search, multimodal plumbing."""
