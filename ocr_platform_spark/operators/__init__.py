"""Relational + training-data operators (SURVEY.md §2.3 / §2.4 + the
large-scale pipeline ops: dedup, similarity search, text analysis,
multimodal plumbing). Each operator is a small composable function over
DataFrames; ``registry`` exposes them to the driver's DuckDB gate."""
