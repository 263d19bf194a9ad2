"""Unicode NFC normalization — the canonical pre-tokenization step.

Web text arrives in mixed normalization forms: "café" may be U+00E9
(precomposed) or U+0065 U+0301 (e + combining acute).  Every exact
operator downstream — md5 dedup, shingle join, eval-set
decontamination, token hashing — treats the two as DIFFERENT strings,
so a corpus that skips normalization silently under-dedupes and
under-decontaminates.  Pipelines therefore normalize to NFC before
any hashing (see e.g. the CCNet / Gopher preprocessing descriptions).

Spark has no built-in Unicode normalizer, so this is the canonical
"Python where the JVM genuinely can't" case: an Arrow-batched pandas
UDF over ``unicodedata.normalize`` — one C-implemented call per
string on whole Arrow batches, never per-row Python object plumbing
in the plan.  It is a NARROW map: no shuffle, no state, pushdown and
pruning flow straight through, and at 100 TB it scales exactly like
the scan itself.

Cross-engine parity: Unicode canonical composition is fully specified
by UAX #15, so CPython's ``unicodedata`` (UCD tables) and DuckDB's
``nfc_normalize`` (utf8proc) agree bit-for-bit on any valid input —
which is what makes a value-hash oracle possible for a Python-UDF
operator at all.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


# DataType object, not a DDL string: the string form is parsed via the
# active SparkContext, which would make importing this module require
# a running session.
@F.pandas_udf(StringType())
def nfc(s: pd.Series) -> pd.Series:
    """NFC-normalize a string column (NULL-preserving)."""
    return s.map(
        lambda x: unicodedata.normalize("NFC", x) if x is not None else None
    )


def normalize_nfc(
    df: DataFrame, text_col: str, out_col: str = "text_nfc"
) -> DataFrame:
    """Append ``out_col`` = NFC(``text_col``) plus integer audit
    columns ``chars_pre`` / ``chars_post`` (codepoint counts — the
    delta is exactly the number of composed sequences, a free
    data-quality signal for "how un-normalized is this crawl")."""
    return (
        df.withColumn(out_col, nfc(F.col(text_col)))
        .withColumn("chars_pre", F.length(F.col(text_col)).cast("long"))
        .withColumn("chars_post", F.length(F.col(out_col)).cast("long"))
    )
