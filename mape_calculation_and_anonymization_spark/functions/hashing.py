"""Keyed pseudonym hashing (X5).

The reference pseudonymizes uid values with
``hashlib.blake2b(x.encode(), digest_size=5).hexdigest()`` applied via
``Series.apply`` (reference/anonymize_datasets.py:60,74). Spark has no
blake2b builtin (sha2/md5/xxhash64 only), and digest compatibility
with key tables produced by earlier runs requires byte-identical
output — so this is one of the two places the engine legitimately
drops to Python, as a vectorized Arrow-batched pandas UDF rather than
a row-at-a-time lambda.

Known digest anchor (used by tests): blake2b('12345') → '7adcf6378f'.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _blake2b_hex(value: str | None) -> str | None:
    if value is None:
        return None
    return hashlib.blake2b(str(value).encode(), digest_size=5).hexdigest()


@F.pandas_udf(T.StringType())
def blake2b_10hex(s: pd.Series) -> pd.Series:
    """10-hex-char blake2b pseudonym, null-preserving."""
    return s.map(_blake2b_hex)
