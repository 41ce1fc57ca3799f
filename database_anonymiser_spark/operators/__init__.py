"""Extension operators beyond the reference's surface (SURVEY.md §2 extensions
+ BASELINE.json north star): deduplication, similarity search, text analysis,
multimodal column plumbing. All Spark-first: built-in expressions and
relational composition wherever semantics allow; Pandas UDFs only for the
genuinely non-relational pieces (multimodal decode stubs)."""
