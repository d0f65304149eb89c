"""Operators: cleaning transforms (P2-P10), aggregation (A1-A5 +
quantiles/skew/stats), schema mapper (J1-J5), joins (as-of/range/
salted), dedup family (exact/n-gram/MinHash incl. the incremental
index/SimHash/embedding + connected components), similarity search
(exact GEMM, sign-LSH, IVF-Flat, IVF-PQ), text analysis + BPE
tokenizer, corpus prep, Gopher quality, validation +
write-audit-publish, multimodal plumbing, storage layout,
materialized views, SCD-adjacent reshaping (pivot/unpivot),
time series, funnels, cohorts, drift detection, n-gram LM perplexity
(CCNet buckets), DSIR importance resampling, semantic dedup
(SemDeDup), learned quality classifier (GPT-3 CommonCrawl filter).
See SURVEY.md §2."""
