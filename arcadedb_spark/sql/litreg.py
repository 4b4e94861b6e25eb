"""Side-channel registry mapping compiled literal Columns → python values.

Some builders need the *python* value of an argument (e.g. ``round``'s
scale, ``format``'s pattern).  pyspark Columns don't expose literal values
portably, so the expression compiler registers every ``lit()`` it creates
here, and builders look the value up by object identity.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column

_literals: dict[int, Any] = {}
_keepalive: list[Column] = []


def register(col: Column, value: Any) -> Column:
    _literals[id(col)] = value
    _keepalive.append(col)  # keep id() stable for the process lifetime
    if len(_keepalive) > 100_000:  # bound memory for long sessions
        drop = _keepalive[:50_000]
        del _keepalive[:50_000]
        for c in drop:
            _literals.pop(id(c), None)
    return col


def value_of(col: Any) -> Any:
    """Python value of a compiled literal Column, or the object itself if it
    is already a plain python value; None if unknown."""
    if not isinstance(col, Column):
        return col
    return _literals.get(id(col))


def is_registered_null(col: Any) -> bool:
    """True when the Column was compiled from a literal null (distinct
    from 'not a registered literal', where value_of is also None)."""
    return isinstance(col, Column) and id(col) in _literals \
        and _literals[id(col)] is None
