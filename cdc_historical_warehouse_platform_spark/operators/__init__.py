"""Operator library: SCD2 merge, CDC detection, dedup families,
similarity search, text analysis, as-of joins, multimodal plumbing."""
