"""Deterministic corpus sampling for training-data mixtures.

A 100 TB pretraining pipeline samples by CONTENT-STABLE hash, never by
`rand()`: re-runs, retries, and incremental refreshes must keep the
same rows, and the sample decision must be auditable outside Spark.
The primitive here compares a salted md5 of the row key against a hex
threshold — md5 hex + string compare are bit-identical across engines
(DuckDB, Trino, Spark), so the exact sample is re-derivable anywhere.
Everything is a filter projection: no shuffle, no RNG state, and the
predicate pushes down to the scan when the key is a column.

North-star extension (no reference analogue — single-node pandas has
`df.sample`, which is neither stable nor distributed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 4  # 16^4 = 65536 buckets → rate granularity 1/65536


def rate_to_hex_threshold(rate: float) -> str:
    """Map a sample rate in [0, 1] to the md5-prefix hex threshold the
    portable predicate compares against (4 hex chars, zero-padded)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return format(int(rate * (16 ** _HEX_DIGITS)), f"0{_HEX_DIGITS}x")


def hash_sample_predicate(
    key: str | Column, rate: float, salt: str = "sample"
) -> Column:
    """True iff the row is in the sample: the first 4 hex chars of
    ``md5(salt || ':' || key)`` fall below the rate's threshold."""
    c = F.col(key) if isinstance(key, str) else key
    prefix = F.substring(F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string"))), 1, _HEX_DIGITS)
    return prefix < F.lit(rate_to_hex_threshold(rate))


def hash_split(
    key: str | Column, fractions: dict[str, float], salt: str = "split"
) -> Column:
    """Deterministic dataset-split assignment (train/val/test): maps
    the md5-prefix of the salted key into cumulative-fraction hex
    bands. Content-stable — a document keeps its split across re-runs
    and incremental refreshes, which is what keeps eval sets
    uncontaminated when the corpus is rebuilt. Pure projection: no
    shuffle, no RNG.

    ``fractions`` are name → fraction; they must sum to 1.0 (within
    1/65536). Iteration order of the dict defines the band order, so
    pass an ordered mapping (dicts preserve insertion order)."""
    total = sum(fractions.values())
    if not 0.999984 <= total <= 1.000016:  # 1/65536 tolerance
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    c = F.col(key) if isinstance(key, str) else key
    prefix = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string"))), 1, _HEX_DIGITS
    )
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        thr = F.lit(rate_to_hex_threshold(min(cum, 1.0)))
        expr = (
            F.when(prefix < thr, name)
            if expr is None
            else expr.when(prefix < thr, name)
        )
    # last band absorbs the remainder so the assignment is total
    return F.lit(names[0]) if expr is None else expr.otherwise(names[-1])


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. keep 50% of 'en' docs,
    10% of everything else) — the mixture-weighting step of a training
    corpus. One CASE-over-threshold filter, no shuffle; each stratum's
    sample is independent of every other's (the salt includes the
    stratum, so identical keys across strata decorrelate)."""
    c = F.col(strata_col)
    thr = F.lit(rate_to_hex_threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(c == stratum, F.lit(rate_to_hex_threshold(rate))).otherwise(thr)
    prefix = F.substring(
        F.md5(
            F.concat(
                F.lit(f"{salt}:"),
                c.cast("string"),
                F.lit(":"),
                F.col(key_col).cast("string"),
            )
        ),
        1,
        _HEX_DIGITS,
    )
    return df.filter(prefix < thr)
