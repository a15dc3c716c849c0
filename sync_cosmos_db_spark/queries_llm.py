"""LLM-data-pipeline extension queries (SURVEY.md §2.3, X1-X8).

Filled in as operators land: dedup, similarity search, text analysis,
event windows, sketches.
"""

from __future__ import annotations
