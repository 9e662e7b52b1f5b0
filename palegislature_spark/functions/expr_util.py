"""Expression-level let-binding.

Composite Column expressions that reference an expensive sub-
expression many times (a parsed struct consumed field-by-field, a
char-fold used in several branches) blow up: every reference copies
the whole subtree, so analysis/optimization cost grows multiplica-
tively with nesting and the value is re-evaluated at runtime.

``let(value, body)`` binds ``value`` to a higher-order-function
lambda variable: ``transform(array(value), v -> body(v))[1]``. The
lambda variable is a leaf node — the tree stays small — and the
engine evaluates ``value`` exactly once per row. Nesting works;
inner lambdas may reference outer variables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once; feed it to ``body`` as a bound variable."""
    return F.element_at(F.transform(F.array(value), body), 1)


def let2(a: Column, b: Column, body: Callable[[Column, Column], Column]) -> Column:
    """Two-value let (packed through a struct)."""
    packed = F.struct(a.alias("a"), b.alias("b"))
    return let(packed, lambda p: body(p["a"], p["b"]))
