"""Operator library: relational helpers, CDC merge, watermark protocol,
dedup, similarity search, text analysis, multimodal columns."""
