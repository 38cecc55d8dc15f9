"""JSONata 1.6 expression engine — the reference's entire query language.

The reference delegates all per-record transformation to the JSONata library,
pinned at 1.6.4 (/root/reference/package.json:16), compiled once at startup
(bin/mqtt-streamr.js:108) and evaluated per message (bin:157-159). This
package is an original implementation of that language surface, built from
the public JSONata 1.6 documentation, with two execution backends:

1. ``compile_column`` — AST -> native Spark Column tree (the fast path:
   whole-stage codegen, no Python at execution time). Covers the
   statically-compilable subset (paths, arithmetic, comparisons, boolean
   logic, conditionals, constructors, most of the function library).
2. ``Interpreter`` — a pure-Python tree-walking evaluator with full JSONata
   sequence semantics, wrapped in an Arrow-batched pandas UDF for the long
   tail (recursion, closures, ``**`` descendants, order-by, group-by).

``jsonata(expr)`` mirrors the reference's API shape: parse once, evaluate
many times.
"""

from mqtt_streamr_spark.jsonata.errors import JsonataError, NotCompilable
from mqtt_streamr_spark.jsonata.interpreter import Interpreter
from mqtt_streamr_spark.jsonata.parser import parse


class JsonataExpression:
    """A parsed JSONata expression (parse once — bin/mqtt-streamr.js:108)."""

    def __init__(self, source: str):
        self.source = source
        self.ast = parse(source)
        self._interp = Interpreter(self.ast)

    def evaluate(self, value, seed: int | None = None):
        """Evaluate against one JSON value (Python dict/list/scalar).

        ``seed`` (engine extension) pins ``$random``/``$shuffle`` to the
        deterministic LCG stream documented on
        ``interpreter.SeededLCG`` — nondeterministic functions become
        reproducible (and oracle-checkable) per evaluation. None keeps
        the spec's nondeterminism."""
        return self._interp.evaluate(value, seed=seed)


def jsonata(source: str) -> JsonataExpression:
    return JsonataExpression(source)


__all__ = ["jsonata", "JsonataExpression", "JsonataError", "NotCompilable", "parse"]
