"""PySpark-native crawl frontier + fetch scheduler engine.

A from-scratch re-imagining of the capabilities of the reference
crawler ``AInoriex/crawler_apple_podcast`` (read-only at
``/root/reference/``) as distributed DataFrame operations over
Common-Crawl-style page tables:

- ``datagen``    deterministic synthetic page corpus (no network)
- ``functions``  URL canonicalization / extraction expressions
- ``operators``  dedupe (exact + Bloom-gated), politeness, skew, similarity
- ``plans``      wave loop orchestration + checkpoint snapshots
- ``streaming``  Structured Streaming frontier variant

Everything is expressed with the DataFrame API + vectorized
pandas/Arrow UDFs; no per-row Python UDFs, no RDDs.
"""

__version__ = "0.1.0"
