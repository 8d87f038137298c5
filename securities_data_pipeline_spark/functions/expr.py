"""Expression-level helpers shared by array-heavy operators.

``let(expr, body)`` is a let-binding for Spark SQL expressions: it
evaluates ``expr`` ONCE per row and exposes the result to ``body`` as a
lambda variable. Without it, chained ``select``s that alias an expensive
array expression and then reference the alias inside a higher-order
function get collapsed by Catalyst's CollapseProject, inlining the
definition into the lambda body — which interpreted HOF evaluation then
recomputes PER ELEMENT. A sliding-window sketch over an n-element array
silently turns O(n) into O(n²); at document scale that is the difference
between scan-speed and a hang (measured: >120 s → 3.7 s on 500 docs).

The trick: ``transform(array(expr), x -> body(x))[0]`` — the lambda
variable is bound once per row and lambda variables cannot be inlined.
Pure expression-level, stays in the JVM, no shuffle, composes with
nested HOFs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(expr: Column, body: Callable[[Column], Column]) -> Column:
    """Bind ``expr`` to a per-row variable evaluated once; return
    ``body`` applied to it. Use whenever ``body`` references the bound
    value from inside a higher-order-function lambda."""
    return F.transform(F.array(expr), body)[0]
