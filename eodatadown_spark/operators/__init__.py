"""Large-scale training-data-pipeline operators (dedup, similarity, text,
multimodal) — first-class engine components beyond the reference's surface."""
