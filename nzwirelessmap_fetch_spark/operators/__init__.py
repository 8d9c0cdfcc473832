"""Extension operators beyond the reference's surface (SURVEY.md §2.4):
deduplication, similarity search, text analysis, as-of/range joins,
sessionization, multimodal column plumbing — each designed for 100 TB
(no driver-side materialization, keyed shuffles, broadcastable small sides).
"""
