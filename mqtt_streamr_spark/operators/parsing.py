"""Strict JSON-completeness validation, entirely in Catalyst expressions.

The reference's parse step is ``JSON.parse(payload)`` inside a try/catch
(bin/mqtt-streamr.js:149-155): a payload is valid only if it is EXACTLY
one JSON value (plus surrounding whitespace). Spark's ``try_parse_json``
(and ``from_json``) stop at the end of the first complete value and
silently IGNORE trailing content — ``'{"a":1} {"b":2}'`` parses to
``{"a":1}``, ``'0\\n0'`` to ``0``. That is both a fidelity break (the
reference dead-letters those messages) and silent data mangling (the
second half of the payload vanishes). Probing Spark 4.1's parser shows
this is the ONLY leniency: single quotes, unquoted keys, comments,
trailing commas, leading zeros, NaN/Infinity are all already rejected,
matching JS ``JSON.parse``.

``strict_json_complete`` closes the gap without leaving the JVM:

- scalar roots: one anchored regex over the whitespace-trimmed payload
  (the full JSON scalar grammar is regular);
- container roots: string literals are collapsed with one
  ``regexp_replace`` (their contents are the only place brackets are
  not structural), every non-bracket character is dropped with a
  second, and a single-pass ``aggregate`` over the REMAINING brackets
  (typically ~6 characters for a ~100-char message, vs a naive
  per-character scan) checks three facts that, given ``try_parse_json``
  already certified the leading value, hold exactly when nothing
  follows it: the stripped text ends with a closer, the bracket depth
  returns to zero exactly once, and the final depth is zero. No UDF,
  no Python — everything stays in the codegen'd plan.

Cost (bench's ~100-char event payloads, single-threaded): the naive
per-character state machine measured ~43 us/row (13x the parse
itself); the bracket-only formulation with let-bound intermediates
measures ~16 us/row of overhead on top of the ~4 us/row
parse+payload-build floor. The residual cost is the two regex passes
plus higher-order ``aggregate``/``transform`` sitting outside
whole-stage codegen. The streaming pipeline applies it by default
(``PipelineSpec.strict_parse``) because the reference contract is
strict, with the flag as the opt-out for callers who prefer the raw
``try_parse_json`` leniency.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# JSON whitespace is exactly space/tab/newline/carriage-return (RFC 8259;
# JS JSON.parse matches) — NOT \f or unicode spaces
_WS_TRIM = "^[ \t\n\r]+|[ \t\n\r]+$"

# one complete JSON scalar, anchored (Java regex)
_SCALAR = (
    r'^(-?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?'
    r'|true|false|null'
    r'|"(\\.|[^"\\])*")$'
)

# one JSON string literal (valid strings never contain raw newlines, so
# default non-DOTALL '.' is safe); possessive *+ — the alternatives are
# disjoint, so backtracking is pure cost
_STRING_LIT = r'"(\\.|[^"\\])*+"'


def strict_json_complete(payload: Column) -> Column:
    """TRUE iff the payload is exactly one JSON value + whitespace.

    Completeness only: combine with ``try_parse_json(payload) IS NOT
    NULL`` (which validates the structure of the leading value) for full
    ``JSON.parse`` parity. On a NULL payload returns NULL, which the
    conjunction with the parse check collapses to false.
    """
    # bind intermediates ONCE (Catalyst does not CSE across `when`
    # branches; without the let each regexp_replace re-runs per
    # reference — measured 31 -> ~13 us/row on the bench payloads)
    def _let(col, fn):
        return F.element_at(F.transform(F.array(col), lambda v: fn(v)), 1)

    def _container_ok(stripped):
        # Soundness (given try_parse_json certified the LEADING value):
        # the root closes where depth over its STRUCTURAL brackets
        # first returns to 0. Trailing content either adds brackets (a
        # second zero-crossing, or non-zero final depth) or leaves the
        # stripped text ending in something other than the root's
        # closer. "Closes exactly at the end" == ends-with-closer AND
        # exactly one zero-crossing AND final depth 0.
        ends_ok = F.substring(stripped, -1, 1).isin("}", "]")
        brackets = F.regexp_replace(stripped, r"[^\[\]{}]", "")
        init = F.struct(F.lit(0).alias("depth"), F.lit(0).alias("zeros"))

        def step(acc, c):
            depth = acc["depth"] + F.when(c.isin("{", "["), 1) \
                .otherwise(-1)
            zeros = acc["zeros"] + F.when(depth == 0, 1).otherwise(0)
            return F.struct(depth.alias("depth"), zeros.alias("zeros"))

        state = F.aggregate(F.split(brackets, ""), init,
                            lambda acc, c: F.when(c == "", acc)
                            .otherwise(step(acc, c)))
        return ends_ok & (state["zeros"] == 1) & (state["depth"] == 0)

    return _let(
        F.regexp_replace(payload, _WS_TRIM, ""),
        lambda t: F.when(
            F.substring(t, 1, 1).isin("{", "["),
            _let(F.regexp_replace(t, _STRING_LIT, '""'), _container_ok),
        ).otherwise(t.rlike(_SCALAR)),
    )
