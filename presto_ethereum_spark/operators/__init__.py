"""Large-scale training-data pipeline operators: text analysis, dedup,
similarity search, multimodal column handling."""
