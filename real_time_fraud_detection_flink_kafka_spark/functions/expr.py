"""Expression-level helpers shared across operators."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body) -> Column:
    """Let-binding for Column expressions: evaluate `value` ONCE and
    pass the bound variable to `body` — via a 1-element-array HOF,
    whose lambda argument is a true variable reference.

    Why it exists: higher-order functions evaluate INTERPRETED, outside
    whole-stage codegen's subexpression elimination, and a free subtree
    referenced inside a lambda re-evaluates per element; multiple
    references to the same expression in one projection are
    independent copies. Binding the array (token splits, gram-hash
    arrays, trigram sets) collapses those copies to one evaluation —
    measured 20× on `dedup_winnow` at sf0.1."""
    return F.transform(F.array(value), body)[0]
