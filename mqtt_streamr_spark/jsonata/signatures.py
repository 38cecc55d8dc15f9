"""JSONata function-signature parsing + runtime argument validation.

JSONata 1.6 lambdas may declare a signature — ``function($x)<s-:n>{...}``
(public docs: Programming constructs > "Function signatures"). The
signature is a character mini-language describing parameter types; at
call time the arguments are validated (and in two documented cases
coerced) against it:

type codes   b boolean, n number, s string, l null, a array, o object,
             f function, j any JSON type, x any type
options      ``?``  optional parameter
             ``+``  one or more (the parameter is variadic)
             ``-``  context-substitutable: when the function is called
                    with one argument fewer than declared, the evaluation
                    context is inserted at this position
parameters   ``a<n>`` array of numbers etc. (``f<...>`` accepted, not
             introspected — callables carry no runtime signature here)
choice       ``(sao)`` any of string/array/object
return type  everything after the top-level ``:`` — parsed and ignored,
             as the reference library also ignores it at call time

Documented coercion: a singleton value supplied where an ``a`` parameter
is declared is wrapped into a one-element array ("a singleton value will
be converted to a singleton array").

On mismatch the call raises the reference's T0410-shaped error:
"argument N of function X does not match function signature".

Reference parity: the reference (bin/mqtt-streamr.js:108) delegates to
jsonata 1.6.4, whose signature behavior this module restates from the
public docs; no code from the npm package.
"""

from __future__ import annotations

from mqtt_streamr_spark.jsonata.errors import JsonataError
from mqtt_streamr_spark.jsonata.values import UNDEFINED, JSeq, is_number

_TYPE_CODES = "bnslaofjx"


class Param:
    __slots__ = ("codes", "subtype", "optional", "variadic", "context_sub")

    def __init__(self, codes: str):
        self.codes = codes          # one or more type-code chars
        self.subtype: str | None = None   # element code for a<...>
        self.optional = False       # ?
        self.variadic = False       # +
        self.context_sub = False    # -

    def __repr__(self):  # pragma: no cover
        mods = ("?" if self.optional else "") + \
               ("+" if self.variadic else "") + \
               ("-" if self.context_sub else "")
        sub = f"<{self.subtype}>" if self.subtype else ""
        return f"Param({self.codes}{sub}{mods})"


def parse_signature(sig: str) -> list[Param]:
    """``"<s-:n>"`` -> [Param(s, context_sub)]. Raises on malformed input."""
    if not (sig.startswith("<") and sig.endswith(">")):
        raise JsonataError(f"malformed function signature {sig!r}")
    body = sig[1:-1]
    params: list[Param] = []
    i = 0
    n = len(body)
    while i < n:
        ch = body[i]
        if ch == ":":  # top-level return type — ignored, like the reference
            break
        if ch == "(":  # choice group
            j = body.find(")", i)
            if j < 0:
                raise JsonataError(f"unclosed '(' in signature {sig!r}")
            codes = body[i + 1:j]
            if not codes or any(c not in _TYPE_CODES for c in codes):
                raise JsonataError(
                    f"invalid choice group '({codes})' in signature {sig!r}")
            params.append(Param(codes))
            i = j + 1
        elif ch in _TYPE_CODES:
            params.append(Param(ch))
            i += 1
        elif ch in "?+-":
            if not params:
                raise JsonataError(
                    f"modifier {ch!r} before any type in signature {sig!r}")
            p = params[-1]
            if ch == "?":
                p.optional = True
            elif ch == "+":
                p.variadic = True
            else:
                p.context_sub = True
            i += 1
        elif ch == "<":  # parameterized type: a<n>, f<n:n> — depth scan
            if not params:
                raise JsonataError(
                    f"'<' before any type in signature {sig!r}")
            depth = 0
            j = i
            while j < n:
                if body[j] == "<":
                    depth += 1
                elif body[j] == ">":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if depth != 0:
                raise JsonataError(f"unclosed '<' in signature {sig!r}")
            inner = body[i + 1:j]
            p = params[-1]
            if "a" in p.codes and len(inner) == 1 and inner in _TYPE_CODES:
                p.subtype = inner
            # f<...> (and any nested form): accepted, not introspected
            i = j + 1
        else:
            raise JsonataError(
                f"unexpected {ch!r} in function signature {sig!r}")
    return params


def _matches(value, code: str) -> bool:
    if code == "x":
        return True
    if code == "b":
        return isinstance(value, bool)
    if code == "n":
        return is_number(value)
    if code == "s":
        return isinstance(value, str)
    if code == "l":
        return value is None
    if code == "a":
        return isinstance(value, (list, JSeq))
    if code == "o":
        return isinstance(value, dict)
    if code == "f":
        return callable(value)
    if code == "j":  # any JSON type (everything except functions/undefined)
        return value is not UNDEFINED and not callable(value)
    return False


def _elem_ok(arr, code: str | None) -> bool:
    if code is None:
        return True
    return all(_matches(v, code) for v in arr)


def _type_error(index: int, name: str) -> JsonataError:
    return JsonataError(
        f"argument {index} of function {name} does not match "
        f"function signature")


def _coerce(value, p: Param, index: int, name: str):
    """Validate one supplied value against one param; returns the
    (possibly array-promoted) value or raises."""
    if any(_matches(value, c) for c in p.codes):
        if isinstance(value, (list, JSeq)) and "a" in p.codes \
                and not _elem_ok(value, p.subtype):
            raise _type_error(index, name)
        return value
    # documented coercion: singleton -> array where ONLY an array fits
    if p.codes == "a" and value is not UNDEFINED and not callable(value):
        if p.subtype is None or _matches(value, p.subtype):
            return [value]
    raise _type_error(index, name)


def _coercible(value, p: Param) -> bool:
    """Whether _coerce would accept value for p (match or array
    promotion) — the per-value predicate the backtracking matcher uses."""
    if any(_matches(value, c) for c in p.codes):
        return not (isinstance(value, (list, JSeq)) and "a" in p.codes
                    and not _elem_ok(value, p.subtype))
    if p.codes == "a" and value is not UNDEFINED and not callable(value):
        return p.subtype is None or _matches(value, p.subtype)
    return False


def _assign(params: list[Param], supplied: list):
    """Backtracking arg->param assignment, mirroring the reference's
    regex-based validation (one greedy group per param, with regex
    backtracking): an optional/variadic param followed by more params
    can yield args back — ``<n?s>`` accepts ('hi',) by leaving n? empty,
    ``<n+s>`` accepts (1, 2, 'x') by stopping the variadic before the
    trailing string. Greedy-first, like the regex. Returns a list of
    per-param arg-index lists, or None if no assignment validates
    (ADVICE r8 #1 — the old matcher was greedy with no backtracking)."""

    def rec(pi: int, ai: int):
        if pi == len(params):
            return [] if ai == len(supplied) else None
        p = params[pi]
        if p.variadic:
            max_k = len(supplied) - ai
            min_k = 0 if p.optional else 1
            for k in range(max_k, min_k - 1, -1):
                if not all(_coercible(supplied[ai + j], p)
                           for j in range(k)):
                    continue
                rest = rec(pi + 1, ai + k)
                if rest is not None:
                    return [list(range(ai, ai + k))] + rest
            return None
        if ai < len(supplied) and _coercible(supplied[ai], p):
            rest = rec(pi + 1, ai + 1)
            if rest is not None:
                return [[ai]] + rest
        if p.optional:
            rest = rec(pi + 1, ai)
            if rest is not None:
                return [[]] + rest
        return None

    return rec(0, 0)


def validate_args(params: list[Param], args: list, ctx, name: str) -> list:
    """Validate/coerce a call's arguments against parsed signature params.

    Implements context substitution the way the reference resolves it:
    when the call is one argument short and a ``-``-flagged parameter
    exists, the evaluation context is inserted at the first such
    position, then validation proceeds normally.
    """
    supplied = [a for a in args]
    # drop trailing UNDEFINED padding so arity reflects what was passed
    while supplied and supplied[-1] is UNDEFINED:
        supplied.pop()
    n_declared = len(params)
    if len(supplied) < n_declared:
        for pos, p in enumerate(params):
            if p.context_sub:
                supplied.insert(pos, ctx)
                break

    assignment = _assign(params, supplied)
    if assignment is not None:
        out: list = []
        for p, idxs in zip(params, assignment):
            if not idxs and not p.variadic:
                out.append(UNDEFINED)  # skipped optional param
                continue
            for ai in idxs:
                out.append(_coerce(supplied[ai], p, ai + 1, name))
        return out

    # No assignment validates — re-walk greedily purely to raise the
    # reference-shaped error at the first offending position.
    ai = 0
    for idx, p in enumerate(params, start=1):
        if p.variadic:
            start = ai
            while ai < len(supplied) and _coercible(supplied[ai], p):
                ai += 1
            if ai == start and not p.optional:
                raise _type_error(idx, name)
            continue
        if ai >= len(supplied):
            if p.optional:
                continue
            raise _type_error(idx, name)
        _coerce(supplied[ai], p, idx, name)  # raises on the mismatch
        ai += 1
    raise JsonataError(
        f"function {name} called with too many arguments "
        f"({len(supplied)} for {n_declared})")
