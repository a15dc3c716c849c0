"""Extension operators (SURVEY.md §2.3, X1-X8): the LLM-data-pipeline
surface — dedup, similarity search, text analysis, multimodal columns,
sketches. All Spark-first: built-in functions where possible, Arrow-batched
Pandas UDFs only where genuinely needed (multimodal decode)."""
