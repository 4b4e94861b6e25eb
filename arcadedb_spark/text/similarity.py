"""String-similarity tail that needs per-row iteration.

Parity: function/text/TextJaroWinklerDistance.java (standard Jaro with
matching window max(len)/2−1, transposition halving, Winkler prefix
boost weight 0.1 capped at 4 chars) and
query/sql/method/string/SQLMethodNormalize.java (java.text.Normalizer
forms; optional regex removal — the accent-strip idiom is
``normalize('NFD', '\\p{M}')``).

These are Arrow-batched pandas UDFs: the scalar loop runs per Arrow
batch in one Python roundtrip, not per row through pickled closures.
"""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

_WINKLER_PREFIX_WEIGHT = 0.1
_WINKLER_MAX_PREFIX = 4


def jaro_winkler(s1: str | None, s2: str | None) -> float | None:
    if s1 is None or s2 is None:
        return None
    if s1 == s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    jaro = _jaro(s1, s2)
    prefix = 0
    for a, b in zip(s1[:_WINKLER_MAX_PREFIX], s2[:_WINKLER_MAX_PREFIX]):
        if a != b:
            break
        prefix += 1
    return jaro + prefix * _WINKLER_PREFIX_WEIGHT * (1.0 - jaro)


def _jaro(s1: str, s2: str) -> float:
    len1, len2 = len(s1), len(s2)
    window = max(0, max(len1, len2) // 2 - 1)
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, ch in enumerate(s1):
        for j in range(max(0, i - window), min(i + window + 1, len2)):
            if m2[j] or ch != s2[j]:
                continue
            m1[i] = m2[j] = True
            matches += 1
            break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(len1):
        if not m1[i]:
            continue
        while not m2[k]:
            k += 1
        if s1[i] != s2[k]:
            transpositions += 1
        k += 1
    return (
        matches / len1 + matches / len2
        + (matches - transpositions // 2) / matches
    ) / 3.0


_UDFS: dict = {}


def jaro_winkler_udf():
    if "jw" not in _UDFS:
        import pandas as pd

        def batch(a, b):
            return pd.Series(
                [jaro_winkler(x, y) for x, y in zip(a, b)], dtype="float64"
            )

        _UDFS["jw"] = F.pandas_udf(batch, DoubleType())
    return _UDFS["jw"]


def normalize_str(v: str | None, form: str = "NFD", remove: str | None = None) -> str | None:
    if v is None:
        return None
    out = unicodedata.normalize(form, v)
    if remove is not None:
        # Java regex \p{M} family works in Python via per-char category
        # test when the pattern is exactly a mark class; otherwise re.sub
        if remove in (r"\p{M}", r"\p{Mn}", r"\p{InCombiningDiacriticalMarks}"):
            out = "".join(c for c in out if not unicodedata.category(c).startswith("M"))
        else:
            out = re.sub(remove, "", out)
    return out


def normalize_udf(form: str = "NFD", remove: str | None = None):
    key = ("norm", form, remove)
    if key not in _UDFS:
        import pandas as pd

        def batch(a):
            return pd.Series([normalize_str(x, form, remove) for x in a])

        _UDFS[key] = F.pandas_udf(batch, StringType())
    return _UDFS[key]
