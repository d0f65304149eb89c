"""Operators: cleaning transforms (P2-P10), aggregation (A1-A5), schema
mapper (J1-J5), dedup family, similarity search, text analysis,
multimodal plumbing. See SURVEY.md §2."""
