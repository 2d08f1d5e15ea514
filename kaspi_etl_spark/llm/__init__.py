"""Large-scale training-data pipeline operators.

Beyond the reference's own surface (BASELINE.json north star): exact and
near deduplication, similarity search over embeddings, text analysis, and
multimodal binary-column plumbing — each designed for 100 TB inputs.
"""
