"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal columns.

Not present in the reference (SURVEY.md §2.2 "North-star extensions") —
these are the operators a 100 TB LLM-data pipeline needs, built
Spark-first: JVM-side array/string expressions where possible, Arrow
pandas UDFs where numpy genuinely wins, and every algorithm designed
around a shuffle-friendly blocking/banding scheme rather than all-pairs
comparison.
"""
