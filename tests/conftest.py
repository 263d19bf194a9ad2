from __future__ import annotations

import pytest

from crawler_apple_podcast_spark.datagen import CorpusParams, generate_corpus
from crawler_apple_podcast_spark.datagen.corpus import to_spark
from crawler_apple_podcast_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus_pdfs():
    return generate_corpus(CorpusParams(n_shows=8, max_pages_per_show=5))


@pytest.fixture(scope="session")
def corpus(spark, corpus_pdfs):
    pages_pdf, seeds_pdf = corpus_pdfs
    pages, seeds = to_spark(spark, pages_pdf, seeds_pdf)
    pages.cache().count()
    return pages, seeds
