"""Structured Streaming ports of the reference's incremental semantics
(SURVEY §2.9) plus the north-star streaming operators: watermarked
tumbling/sliding/session windows, stateful dedup, custom state."""
