"""Operator library: dedup, CDC merge, relational extensions, text,
similarity, multimodal — all DataFrame-in/DataFrame-out."""
