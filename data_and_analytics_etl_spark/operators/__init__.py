"""Library operators the engine adds on top of stock Spark.

Each module implements one capability Spark's DataFrame API lacks natively
(SURVEY §4.3): as-of joins, sessionization, per-group top-k, the dedup
family, similarity search, text analysis, multimodal column plumbing, and
skew helpers. All are plan *rewrites* — compositions of built-in operators
that Catalyst optimizes — never driver-side loops.
"""
