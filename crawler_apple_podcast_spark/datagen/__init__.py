from .corpus import CorpusParams, generate_corpus, pages_schema, seeds_schema  # noqa: F401
