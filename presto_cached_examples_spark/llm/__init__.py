"""LLM-data-pipeline operators (north-star mandate, BASELINE.json):
deduplication, similarity search, multimodal columns, text analysis —
designed for 100 TB training-data curation, tested on the `documents`
and `embeddings` fixtures.
"""
