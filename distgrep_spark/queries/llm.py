"""LLM-data-pipeline queries (dedup, similarity, text analysis,
multimodal) — filled in by operators/{dedup,similarity,text,multimodal}.
"""
