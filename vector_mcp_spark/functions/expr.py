"""Expression-level helpers shared across operators."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_once(expr: Column, build: Callable[[Column], Column]) -> Column:
    """Evaluate ``expr`` once and hand it to ``build`` as a bound variable.

    Expressions referenced inside a higher-order-function lambda are
    re-evaluated PER ELEMENT (no common-subexpression elimination across
    the lambda boundary) — e.g. building token n-grams with an inline
    ``tokens(text)`` re-runs the tokenizer regexp for every gram, measured
    10× slower than binding. Wrapping ``expr`` in a one-element array and
    reading it back through ``transform`` turns every use inside ``build``
    into a cheap lambda-variable reference.
    """
    return F.get(F.transform(F.array(expr), build), 0)
