"""Tree-walking JSONata 1.6 evaluator — the full-semantics backend.

This is the correctness reference for the Column compiler (differential
tests run both and require agreement) and the runtime fallback for
constructs the compiler can't express (recursion, closures, ``**``,
group-by, order-by). It mirrors what the reference does per message at
bin/mqtt-streamr.js:157-159, but batched behind Arrow when used inside
``transform_udf`` (see streaming/transform.py).

Original implementation from the public JSONata 1.6 docs; no code from the
jsonata npm package.
"""

from __future__ import annotations

import base64
import datetime as _dt
import math
import random
import re as _re
import time

from mqtt_streamr_spark.jsonata.errors import JsonataError
from mqtt_streamr_spark.jsonata.values import (
    UNDEFINED,
    ConsArray,
    JSeq,
    boolean,
    is_number,
    iter_items,
    jstring,
    normalize_num,
    require_number,
    require_string,
    seq_append,
    to_json_value,
    unwrap,
)


class Environment:
    __slots__ = ("bindings", "parent")

    def __init__(self, parent: "Environment | None" = None):
        self.bindings: dict = {}
        self.parent = parent

    def lookup(self, name: str):
        env = self
        while env is not None:
            if name in env.bindings:
                return env.bindings[name]
            env = env.parent
        return UNDEFINED

    def bind(self, name: str, value) -> None:
        self.bindings[name] = value


class Lambda:
    __slots__ = ("params", "body", "env", "interp", "signature")

    def __init__(self, params, body, env, interp, signature=None):
        self.params = params
        self.body = body
        self.env = env
        self.interp = interp
        # parsed list[signatures.Param] or None — enforced in
        # Interpreter._call, where the caller's context is in scope
        self.signature = signature

    def __call__(self, *args):
        env = Environment(self.env)
        for name, val in zip(self.params, args):
            env.bind(name, val)
        for name in self.params[len(args):]:
            env.bind(name, UNDEFINED)
        return self.interp._eval(self.body, env.lookup("__ctx__"), env)


class Transform:
    """The transform operator ``|location|update[, deletes]|`` — a
    single-argument function value (docs: Other operators). Applying it
    deep-copies the argument, evaluates ``location`` against the copy,
    and for each matched OBJECT merges the ``update`` object into it and
    deletes the keys named by ``deletes`` (string or array of strings),
    both evaluated with the match as context. The mutated copy is
    returned; the input is never modified."""

    __slots__ = ("pattern", "update", "delete", "env", "interp")

    def __init__(self, pattern, update, delete, env, interp):
        self.pattern = pattern
        self.update = update
        self.delete = delete
        self.env = env
        self.interp = interp

    def __call__(self, obj=UNDEFINED, *_extra):
        if obj is UNDEFINED:
            return UNDEFINED
        clone = _clone(to_json_value(obj))
        interp = self.interp
        matches = interp._eval(self.pattern, clone, Environment(self.env))
        for match in iter_items(matches):
            if not isinstance(match, dict):
                # the location path is documented to select objects;
                # non-object matches are left untouched
                continue
            upd = unwrap(interp._eval(self.update, match,
                                      Environment(self.env)))
            if upd is not UNDEFINED:
                if not isinstance(upd, dict):
                    raise JsonataError(
                        "transform update must evaluate to an object")
                match.update(upd)
            if self.delete is not None:
                dels = unwrap(interp._eval(self.delete, match,
                                           Environment(self.env)))
                if dels is not UNDEFINED:
                    if not isinstance(dels, (JSeq, list)):
                        dels = [dels]
                    for key in dels:
                        if not isinstance(key, str):
                            raise JsonataError(
                                "transform delete must be a string or an "
                                "array of strings")
                        match.pop(key, None)
        return clone


def _clone(value):
    """Deep copy of a plain-JSON value (the transform operator mutates a
    private copy, mirroring the reference's serialize/deserialize clone)."""
    if isinstance(value, dict):
        return {k: _clone(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_clone(v) for v in value]
    return value


class Partial:
    """A partially-applied function: ``$substring(?, 0, 5)`` evaluates the
    non-placeholder arguments once and returns a function of the
    placeholders, in order (docs: Programming — partial application)."""

    __slots__ = ("proc", "bound", "interp", "name")

    def __init__(self, proc, bound, interp, name):
        self.proc = proc      # the underlying callable/Lambda/Builtin
        self.bound = bound    # list[(is_placeholder, value)]
        self.interp = interp
        self.name = name

    def resolve(self, values):
        """Fill the placeholder holes, in order, with the call's values."""
        args = []
        vi = 0
        for is_hole, val in self.bound:
            if is_hole:
                args.append(values[vi] if vi < len(values) else UNDEFINED)
                vi += 1
            else:
                args.append(val)
        return args

    def __call__(self, *values):
        # direct invocation (no interpreter ctx in scope); calls routed
        # through Interpreter._call instead thread the caller's context
        # so a '-' context-substitutable param resolves at the CALL site
        # (ADVICE r8 #2)
        return self.interp._call(self.proc, self.resolve(values),
                                 UNDEFINED, self.name)


class SeededLCG:
    """Deterministic RNG for seeded evaluation (engine extension — the
    JSONata spec's ``$random``/``$shuffle`` are nondeterministic, which
    makes them un-oracle-checkable; a caller-supplied seed pins them).

    The algorithm is a CONTRACT, chosen to be restatable in plain SQL so
    DuckDB oracles can reproduce it exactly (glibc-style LCG constants,
    public knowledge):

        state_0   = seed mod 2^31
        state_n+1 = (1103515245 * state_n + 12345) mod 2^31
        $random() -> state_n+1 / 2^31          (exact in float64)
        $shuffle  -> Fisher-Yates descending, j = state_n+1 mod (i+1)

    Both functions draw from the SAME stream, in evaluation order.
    Matches the stdlib ``random`` module's duck type for the two methods
    the builtins use, so unseeded evaluation keeps using the module
    object directly."""

    __slots__ = ("state",)
    _M = 1 << 31

    def __init__(self, seed: int):
        self.state = int(seed) % self._M

    def _draw(self) -> int:
        self.state = (1103515245 * self.state + 12345) % self._M
        return self.state

    def random(self) -> float:
        return self._draw() / self._M

    def shuffle(self, items: list) -> None:
        for i in range(len(items) - 1, 0, -1):
            j = self._draw() % (i + 1)
            items[i], items[j] = items[j], items[i]


class Interpreter:
    def __init__(self, ast):
        self.ast = ast
        self.rng = random  # unseeded default: the stdlib module

    # public API ------------------------------------------------------------
    def evaluate(self, value, seed: int | None = None):
        self.rng = random if seed is None else SeededLCG(seed)
        env = Environment()
        env.bind("$", value)  # $$ root
        result = self._eval(self.ast, value, env)
        return to_json_value(result)

    # core ------------------------------------------------------------------
    def _eval(self, node, ctx, env):
        t = node["type"]
        method = getattr(self, f"_eval_{t.replace('-', '_')}", None)
        if method is None:
            raise JsonataError(f"unsupported node type {t!r}")
        return method(node, ctx, env)

    def _eval_number(self, node, ctx, env):
        return node["value"]

    def _eval_string(self, node, ctx, env):
        return node["value"]

    def _eval_boolean(self, node, ctx, env):
        return node["value"]

    def _eval_null(self, node, ctx, env):
        return None

    def _eval_regex(self, node, ctx, env):
        return _compile_regex(node["pattern"], node["flags"])

    def _eval_variable(self, node, ctx, env):
        name = node["value"]
        if name == "":  # bare $ = context
            return ctx
        if name == "$":
            return env.lookup("$")
        builtin = BUILTINS.get(name)
        found = env.lookup(name)
        if found is not UNDEFINED:
            return found
        if builtin is not None:
            return builtin
        return UNDEFINED

    def _eval_name(self, node, ctx, env):
        return self._lookup_name(ctx, node["value"])

    def _lookup_name(self, ctx, key):
        if ctx is UNDEFINED or ctx is None:
            return UNDEFINED
        if isinstance(ctx, dict):
            return ctx.get(key, UNDEFINED)
        if isinstance(ctx, (JSeq, list)):
            out = JSeq()
            for item in ctx:
                seq_append(out, self._lookup_name(item, key))
            return out
        return UNDEFINED

    def _eval_wildcard(self, node, ctx, env):
        out = JSeq()
        if isinstance(ctx, dict):
            for v in ctx.values():
                seq_append(out, v)
        elif isinstance(ctx, (JSeq, list)):
            for item in ctx:
                if isinstance(item, dict):
                    for v in item.values():
                        seq_append(out, v)
        return out

    def _eval_descendants(self, node, ctx, env):
        out = JSeq()
        if ctx is not UNDEFINED:
            _descend(ctx, out)
        return out

    def _eval_path(self, node, ctx, env):
        lhs = self._eval(node["lhs"], ctx, env)
        rhs = node["rhs"]
        out = JSeq()
        for item in iter_items(lhs):
            seq_append(out, self._eval(rhs, item, env))
        if isinstance(lhs, JSeq) and lhs.keep:
            out.keep = True
        return out

    def _eval_keeparray(self, node, ctx, env):
        value = self._eval(node["expr"], ctx, env)
        if isinstance(value, JSeq):
            value.keep = True
            return value
        if value is UNDEFINED:
            return JSeq(keep=True)
        return JSeq(list(iter_items(value)), keep=True)

    def _eval_predicate(self, node, ctx, env):
        base = self._eval(node["expr"], ctx, env)
        items = list(iter_items(base))
        cond = node["cond"]
        out = JSeq()
        if isinstance(base, JSeq):
            out.keep = base.keep
        n = len(items)
        for idx, item in enumerate(items):
            res = unwrap(self._eval(cond, item, env))
            if _is_index_result(res):
                for num in iter_items(res):
                    if math.floor(num) == idx or math.floor(num) + n == idx:
                        seq_append(out, item)
                        break
            elif boolean(res):
                seq_append(out, item)
        return out

    def _eval_array(self, node, ctx, env):
        out = ConsArray()
        for item_node in node["items"]:
            v = self._eval(item_node, ctx, env)
            if v is UNDEFINED:
                continue
            if isinstance(v, JSeq):
                out.extend(v)
            else:
                out.append(v)
        return out

    def _eval_object(self, node, ctx, env):
        if isinstance(ctx, (JSeq, list)) and not isinstance(ctx, ConsArray):
            return self._group(list(iter_items(ctx)), node["pairs"], env)
        out = {}
        for key_node, val_node in node["pairs"]:
            key = unwrap(self._eval(key_node, ctx, env))
            if not isinstance(key, str):
                raise JsonataError("object key must evaluate to a string")
            val = unwrap(self._eval(val_node, ctx, env))
            if val is not UNDEFINED:
                out[key] = val
        return out

    def _eval_groupby(self, node, ctx, env):
        base = self._eval(node["expr"], ctx, env)
        return self._group(list(iter_items(base)), node["pairs"], env)

    def _group(self, items, pairs, env):
        groups: dict[str, JSeq] = {}
        group_pair: dict[str, int] = {}
        for item in items:
            for pi, (key_node, _) in enumerate(pairs):
                key = unwrap(self._eval(key_node, item, env))
                if key is UNDEFINED:
                    continue
                if not isinstance(key, str):
                    raise JsonataError("group-by key must evaluate to a string")
                if key in groups and group_pair[key] != pi:
                    raise JsonataError(f"duplicate group key {key!r} from "
                                       "multiple key expressions")
                groups.setdefault(key, JSeq()).append(item)
                group_pair[key] = pi
        out = {}
        for key, group in groups.items():
            _, val_node = pairs[group_pair[key]]
            val = unwrap(self._eval(val_node, unwrap(group), env))
            if val is not UNDEFINED:
                out[key] = val
        return out

    def _eval_block(self, node, ctx, env):
        child = Environment(env)
        result = UNDEFINED
        for expr in node["expressions"]:
            result = self._eval(expr, ctx, child)
        return result

    def _eval_bind(self, node, ctx, env):
        value = unwrap(self._eval(node["expr"], ctx, env))
        env.bind(node["var"], value)
        return value

    def _eval_lambda(self, node, ctx, env):
        closure_env = Environment(env)
        closure_env.bind("__ctx__", ctx)
        signature = None
        sig_str = node.get("signature")
        if sig_str is not None:
            from mqtt_streamr_spark.jsonata.signatures import parse_signature
            signature = parse_signature(sig_str)
        return Lambda(node["params"], node["body"], closure_env, self,
                      signature=signature)

    def _eval_transform(self, node, ctx, env):
        return Transform(node["pattern"], node["update"], node["delete"],
                         env, self)

    def _eval_placeholder(self, node, ctx, env):
        raise JsonataError(
            "'?' placeholder is only allowed inside a function call's "
            "argument list (partial application)")

    def _eval_condition(self, node, ctx, env):
        if boolean(self._eval(node["cond"], ctx, env)):
            return self._eval(node["then"], ctx, env)
        if node["else"] is None:
            return UNDEFINED
        return self._eval(node["else"], ctx, env)

    def _eval_unary_(self, node, ctx, env):  # unary minus
        v = unwrap(self._eval(node["expr"], ctx, env))
        if v is UNDEFINED:
            return UNDEFINED
        return -require_number(v, "unary -")

    def _eval_range(self, node, ctx, env):
        lo = unwrap(self._eval(node["lhs"], ctx, env))
        hi = unwrap(self._eval(node["rhs"], ctx, env))
        if lo is UNDEFINED or hi is UNDEFINED:
            return UNDEFINED
        for v in (lo, hi):
            if not is_number(v) or math.floor(v) != v:
                raise JsonataError("range bounds must be integers")
        if lo > hi:
            return JSeq()
        return JSeq(range(int(lo), int(hi) + 1))

    def _eval_binary(self, node, ctx, env):
        op = node["op"]
        if op == "and":
            return boolean(self._eval(node["lhs"], ctx, env)) and boolean(
                self._eval(node["rhs"], ctx, env)
            )
        if op == "or":
            return boolean(self._eval(node["lhs"], ctx, env)) or boolean(
                self._eval(node["rhs"], ctx, env)
            )
        lhs = unwrap(self._eval(node["lhs"], ctx, env))
        rhs = unwrap(self._eval(node["rhs"], ctx, env))
        if op == "&":
            return jstring(lhs) + jstring(rhs)
        if op in ("=", "!="):
            if lhs is UNDEFINED or rhs is UNDEFINED:
                return False
            eq = _jeq(lhs, rhs)
            return eq if op == "=" else not eq
        if op == "in":
            if lhs is UNDEFINED or rhs is UNDEFINED:
                return False
            members = rhs if isinstance(rhs, list) else [rhs]
            return any(_jeq(lhs, m) for m in members)
        if op in ("<", "<=", ">", ">="):
            if lhs is UNDEFINED or rhs is UNDEFINED:
                return UNDEFINED
            if not (
                (is_number(lhs) and is_number(rhs))
                or (isinstance(lhs, str) and isinstance(rhs, str))
            ):
                raise JsonataError(
                    f"{op}: operands must both be numbers or both strings"
                )
            return {"<": lhs < rhs, "<=": lhs <= rhs,
                    ">": lhs > rhs, ">=": lhs >= rhs}[op]
        # arithmetic
        if lhs is UNDEFINED or rhs is UNDEFINED:
            return UNDEFINED
        a = require_number(lhs, op)
        b = require_number(rhs, op)
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            if b == 0:
                raise JsonataError("division by zero")
            return a / b
        if op == "%":
            if b == 0:
                raise JsonataError("modulo by zero")
            return math.fmod(a, b)  # JS remainder: sign of dividend
        raise JsonataError(f"unknown operator {op!r}")

    def _eval_sort(self, node, ctx, env):
        base = self._eval(node["expr"], ctx, env)
        items = list(iter_items(base))
        terms = node["terms"]

        def key_tuple(item):
            keys = []
            for term in terms:
                v = unwrap(self._eval(term["expr"], item, env))
                if not (is_number(v) or isinstance(v, str)):
                    raise JsonataError("sort term must be a number or string")
                keys.append((term["descending"], v))
            return keys

        decorated = [(key_tuple(it), i, it) for i, it in enumerate(items)]

        import functools

        def cmp(a, b):
            for (desc_a, va), (_, vb) in zip(a[0], b[0]):
                if va == vb:
                    continue
                try:
                    lt = va < vb
                except TypeError:
                    raise JsonataError(
                        "sort terms must be all numbers or all strings"
                    ) from None
                return (1 if lt else -1) if desc_a else (-1 if lt else 1)
            return a[1] - b[1]  # stable

        decorated.sort(key=functools.cmp_to_key(cmp))
        return JSeq(it for _, _, it in decorated)

    _NO_EXTRA = object()  # sentinel: None is a real JSON value (null)

    def _eval_call(self, node, ctx, env, extra_first_arg=_NO_EXTRA):
        proc_node = node["proc"]
        proc = self._eval(proc_node, ctx, env)
        name = proc_node.get("value", "<lambda>")
        if any(a["type"] == "placeholder" for a in node["args"]):
            # partial application: evaluate the non-placeholder arguments
            # once, return a function of the placeholders in order
            if proc is UNDEFINED or not (
                isinstance(proc, (Lambda, Builtin)) or callable(proc)
            ):
                raise JsonataError(
                    f"attempted to partially apply a non-function ${name}")
            # _eval_apply routes placeholder-bearing rhs calls down the
            # value path, so extra_first_arg can never combine with
            # placeholders (and chained-lhs-as-non-hole-first-arg would
            # not be '~>' semantics anyway — ADVICE r8 #4)
            assert extra_first_arg is Interpreter._NO_EXTRA
            bound = [
                (True, None) if a["type"] == "placeholder"
                else (False, unwrap(self._eval(a, ctx, env)))
                for a in node["args"]
            ]
            return Partial(proc, bound, self, name)
        args = [unwrap(self._eval(a, ctx, env)) for a in node["args"]]
        if extra_first_arg is not Interpreter._NO_EXTRA:
            args = [extra_first_arg] + args
        return self._call(proc, args, ctx, name)

    def _call(self, proc, args, ctx, name):
        if isinstance(proc, Partial):
            # unwrap the partial HERE so the wrapped function's signature
            # validation sees the CALL site's context ('-' substitution)
            return self._call(proc.proc, proc.resolve(args), ctx,
                              proc.name)
        if isinstance(proc, Lambda):
            if proc.signature is not None:
                from mqtt_streamr_spark.jsonata.signatures import (
                    validate_args,
                )
                args = validate_args(proc.signature, args, unwrap(ctx), name)
            return unwrap(proc(*args))
        if isinstance(proc, Builtin):
            return proc.invoke(self, ctx, args)
        if proc is UNDEFINED:
            raise JsonataError(f"attempted to invoke non-function ${name}")
        if callable(proc):
            return proc(*args)
        raise JsonataError(f"${name} is not a function")

    def _eval_apply(self, node, ctx, env):
        lhs = unwrap(self._eval(node["lhs"], ctx, env))
        rhs = node["rhs"]
        if rhs["type"] == "call" and not any(
            a["type"] == "placeholder" for a in rhs["args"]
        ):
            return self._eval_call(rhs, ctx, env, extra_first_arg=lhs)
        # rhs evaluates to a function value (variable, lambda, transform,
        # or a partial application like `x ~> $substring(?, 0, 3)`): the
        # chained value becomes its single argument
        proc = unwrap(self._eval(rhs, ctx, env))
        return self._call(proc, [lhs], ctx, "<chained>")


def _descend(value, out: JSeq) -> None:
    if isinstance(value, (JSeq, list)):
        for item in value:
            _descend(item, out)
        return
    out.append(value)
    if isinstance(value, dict):
        for v in value.values():
            _descend(v, out)


def _is_index_result(res) -> bool:
    if is_number(res):
        return True
    if isinstance(res, list) and res and all(is_number(v) for v in res):
        return True
    return False


def _jeq(a, b) -> bool:
    """JSONata deep equality; cross-type comparisons are false (not errors)."""
    if is_number(a) and is_number(b):
        return float(a) == float(b)
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if type(a) is not type(b) and not (
        isinstance(a, list) and isinstance(b, list)
    ):
        return False
    if isinstance(a, list):
        return len(a) == len(b) and all(_jeq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict):
        return a.keys() == b.keys() and all(_jeq(a[k], b[k]) for k in a)
    return a == b


# --- regex helpers -----------------------------------------------------------

def _js_ascii_classes(pattern: str) -> str:
    """Pin Python ``re`` to JS RegExp semantics — the REFERENCE engine,
    via jsonata 1.6.4 — for the divergent escape classes: ASCII
    ``\\d``/``\\D``/``\\w``/``\\W`` (r7 audit; Python's are
    Unicode-aware), the explicit ECMAScript whitespace set for
    ``\\s``/``\\S``, and ASCII-word lookarounds for ``\\b``/``\\B``
    (r8 — closing the two documented approximation tails). Shared
    scanner + class table: jsonata/regexes.py."""
    from mqtt_streamr_spark.jsonata.regexes import js_fidelity_rewrite

    return js_fidelity_rewrite(pattern, "python")


def _compile_regex(pattern: str, flags: str):
    f = 0
    if "i" in flags:
        f |= _re.IGNORECASE
    if "m" in flags:
        f |= _re.MULTILINE
    if "s" in flags:
        f |= _re.DOTALL
    if "x" in flags:
        f |= _re.VERBOSE
    return _re.compile(_js_ascii_classes(pattern), f)


def _as_regex(pat):
    if isinstance(pat, _re.Pattern):
        return pat
    return None


# --- builtin function library (JSONata 1.6 surface, SURVEY.md §2.6) ----------

class Builtin:
    """A builtin with JSONata's context-injection rule: when called with one
    argument fewer than the minimum, the evaluation context is inserted as
    the first argument (enables ``a.$uppercase()``)."""

    __slots__ = ("name", "fn", "min_args", "max_args", "ctx_inject",
                 "first_type")

    def __init__(self, name, fn, min_args, ctx_inject=True, first_type=None):
        import inspect

        self.name = name
        self.fn = fn
        self.min_args = min_args
        # positional capacity of the implementation (minus the interp arg)
        self.max_args = len(inspect.signature(fn).parameters) - 1
        self.ctx_inject = ctx_inject
        self.first_type = first_type

    def invoke(self, interp, ctx, args):
        if self.ctx_inject and len(args) < self.max_args:
            # inject the context as the first argument when (a) one arg
            # short of the minimum (classic ``a.$uppercase()``), or (b) the
            # declared first-arg type doesn't match — which catches context
            # calls that pass OPTIONAL args, e.g. ``s.$match(/re/, 2)``
            if len(args) == self.min_args - 1 or (
                self.first_type is not None
                and args
                and args[0] is not UNDEFINED
                and not isinstance(args[0], self.first_type)
            ):
                args = [unwrap(ctx)] + args
        return self.fn(interp, *args)


def _b(name, min_args, ctx_inject=True, first_type=None):
    def deco(fn):
        BUILTINS[name] = Builtin(name, fn, min_args, ctx_inject,
                                 first_type=first_type)
        return fn

    return deco


BUILTINS: dict[str, Builtin] = {}


# string ----------------------------------------------------------------------

@_b("string", 1)
def _f_string(interp, value=UNDEFINED, pretty=UNDEFINED):
    if value is UNDEFINED:
        return UNDEFINED
    return jstring(value, pretty=boolean(pretty))


@_b("length", 1)
def _f_length(interp, s=UNDEFINED):
    if s is UNDEFINED:
        return UNDEFINED
    if not isinstance(s, str):
        raise JsonataError("$length expects a string")
    return len(s)


@_b("substring", 2, first_type=str)
def _f_substring(interp, s=UNDEFINED, start=0, length=UNDEFINED):
    if s is UNDEFINED:
        return UNDEFINED
    require_string(s, "$substring")
    start = int(require_number(start, "$substring"))
    if start < 0:
        start = max(0, len(s) + start)
    if length is UNDEFINED:
        return s[start:]
    return s[start:start + int(require_number(length, "$substring"))]


@_b("substringBefore", 2)
def _f_substring_before(interp, s=UNDEFINED, sep=""):
    if s is UNDEFINED:
        return UNDEFINED
    idx = require_string(s, "$substringBefore").find(
        require_string(sep, "$substringBefore"))
    return s if idx < 0 else s[:idx]


@_b("substringAfter", 2)
def _f_substring_after(interp, s=UNDEFINED, sep=""):
    if s is UNDEFINED:
        return UNDEFINED
    idx = require_string(s, "$substringAfter").find(
        require_string(sep, "$substringAfter"))
    return s if idx < 0 else s[idx + len(sep):]


@_b("uppercase", 1)
def _f_upper(interp, s=UNDEFINED):
    return UNDEFINED if s is UNDEFINED \
        else require_string(s, "$uppercase").upper()


@_b("lowercase", 1)
def _f_lower(interp, s=UNDEFINED):
    return UNDEFINED if s is UNDEFINED \
        else require_string(s, "$lowercase").lower()


@_b("trim", 1)
def _f_trim(interp, s=UNDEFINED):
    if s is UNDEFINED:
        return UNDEFINED
    return _re.sub(r"\s+", " ", require_string(s, "$trim")).strip()


@_b("pad", 2, first_type=str)
def _f_pad(interp, s=UNDEFINED, width=0, char=" "):
    if s is UNDEFINED:
        return UNDEFINED
    require_string(s, "$pad")
    require_string(char, "$pad")
    width = int(require_number(width, "$pad"))
    if abs(width) <= len(s):
        return s
    pad = (char * (abs(width) - len(s)))[: abs(width) - len(s)]
    return pad + s if width < 0 else s + pad


@_b("contains", 2)
def _f_contains(interp, s=UNDEFINED, pat=UNDEFINED):
    if s is UNDEFINED:
        return UNDEFINED
    require_string(s, "$contains")
    rx = _as_regex(pat)
    if rx is not None:
        return rx.search(s) is not None
    return require_string(pat, "$contains") in s


@_b("split", 2, first_type=str)
def _f_split(interp, s=UNDEFINED, sep=UNDEFINED, limit=UNDEFINED):
    if s is UNDEFINED:
        return UNDEFINED
    require_string(s, "$split")
    lim = None if limit is UNDEFINED else int(require_number(limit, "$split"))
    rx = _as_regex(sep)
    if rx is None:
        require_string(sep, "$split")
    if rx is not None:
        parts = rx.split(s)
        if rx.groups:
            # Python interleaves capture-group text; JSONata returns only
            # the split segments (indices 0, g+1, 2(g+1), ...)
            parts = parts[::rx.groups + 1]
    elif sep == "":
        parts = list(s)
    else:
        parts = s.split(sep)
    if lim is not None:
        parts = parts[:lim]
    return ConsArray(parts)


@_b("join", 1)
def _f_join(interp, arr=UNDEFINED, sep=""):
    if arr is UNDEFINED:
        return UNDEFINED
    require_string(sep, "$join")
    items = [arr] if isinstance(arr, str) else list(iter_items(arr))
    for it in items:
        if not isinstance(it, str):
            raise JsonataError("$join expects an array of strings")
    return sep.join(items)


def _js_replacement(template: str, m: _re.Match) -> str:
    out = []
    i = 0
    while i < len(template):
        ch = template[i]
        if ch == "$" and i + 1 < len(template):
            nxt = template[i + 1]
            if nxt == "$":
                out.append("$")
                i += 2
                continue
            j = i + 1
            num = ""
            while j < len(template) and template[j].isdigit() and len(num) < 2:
                cand = num + template[j]
                if int(cand) <= len(m.groups()):
                    num = cand
                    j += 1
                else:
                    break
            if num:
                out.append(m.group(int(num)) or "")
                i = j
                continue
        out.append(ch)
        i += 1
    return "".join(out)


@_b("replace", 3, first_type=str)
def _f_replace(interp, s=UNDEFINED, pat=UNDEFINED, repl=UNDEFINED,
               limit=UNDEFINED):
    if s is UNDEFINED:
        return UNDEFINED
    require_string(s, "$replace")
    # limit is the MAX number of replacements: 0 means none (Python's
    # count=0 would mean all), negative is error D3011
    lim = None if limit is UNDEFINED else int(require_number(limit, "$replace"))
    if lim is not None and lim < 0:
        raise JsonataError("$replace: limit must be non-negative")
    rx = _as_regex(pat)
    if rx is None:
        if pat == "":
            raise JsonataError("$replace: empty pattern")
        if callable(repl):
            raise JsonataError("$replace: function replacement requires regex")
        require_string(repl, "$replace")
        if lim is None:
            return s.replace(pat, repl)
        return s.replace(pat, repl, lim)
    if isinstance(repl, (Lambda, Builtin)) or callable(repl):
        def subfn(m):
            arg = {"match": m.group(0), "index": m.start(),
                   "groups": ConsArray(g or "" for g in m.groups())}
            res = interp._call(repl, [arg], None, "replace")
            if not isinstance(res, str):
                raise JsonataError("$replace function must return a string")
            return res
    else:
        require_string(repl, "$replace")

        def subfn(m):
            return _js_replacement(repl, m)
    if lim == 0:
        return s
    return rx.sub(subfn, s, count=lim or 0)


@_b("match", 2, first_type=str)
def _f_match(interp, s=UNDEFINED, pat=UNDEFINED, limit=UNDEFINED):
    if s is UNDEFINED:
        return UNDEFINED
    require_string(s, "$match")
    rx = _as_regex(pat)
    if rx is None:
        raise JsonataError("$match expects a regex")
    lim = math.inf if limit is UNDEFINED else require_number(limit, "$match")
    out = ConsArray()
    for m in rx.finditer(s):
        if len(out) >= lim:
            break
        out.append({"match": m.group(0), "index": m.start(),
                    "groups": ConsArray(g or "" for g in m.groups())})
    return out


@_b("base64encode", 1)
def _f_b64e(interp, s=UNDEFINED):
    if s is UNDEFINED:
        return UNDEFINED
    require_string(s, "$base64encode")
    return base64.b64encode(s.encode()).decode()


@_b("base64decode", 1)
def _f_b64d(interp, s=UNDEFINED):
    if s is UNDEFINED:
        return UNDEFINED
    require_string(s, "$base64decode")
    return base64.b64decode(s.encode()).decode()


# numeric ---------------------------------------------------------------------

@_b("number", 1)
def _f_number(interp, v=UNDEFINED):
    if v is UNDEFINED:
        return UNDEFINED
    if is_number(v):
        return v
    if isinstance(v, bool):
        raise JsonataError("$number: cannot cast boolean")
    if isinstance(v, str):
        try:
            f = float(v)
        except ValueError as exc:
            raise JsonataError(f"$number: cannot cast {v!r}") from exc
        return normalize_num(f)
    raise JsonataError(f"$number: cannot cast {type(v).__name__}")


@_b("abs", 1)
def _f_abs(interp, v=UNDEFINED):
    return UNDEFINED if v is UNDEFINED else abs(require_number(v, "$abs"))


@_b("floor", 1)
def _f_floor(interp, v=UNDEFINED):
    return UNDEFINED if v is UNDEFINED else math.floor(require_number(v, "$floor"))


@_b("ceil", 1)
def _f_ceil(interp, v=UNDEFINED):
    return UNDEFINED if v is UNDEFINED else math.ceil(require_number(v, "$ceil"))


@_b("round", 1)
def _f_round(interp, v=UNDEFINED, precision=0):
    if v is UNDEFINED:
        return UNDEFINED
    v = require_number(v, "$round")
    p = int(require_number(precision, "$round"))
    return normalize_num(round(v, p) if p else float(round(v)))  # half-even


@_b("power", 2)
def _f_power(interp, base=UNDEFINED, exp=UNDEFINED):
    if base is UNDEFINED:
        return UNDEFINED
    return normalize_num(
        math.pow(require_number(base, "$power"), require_number(exp, "$power"))
    )


@_b("sqrt", 1)
def _f_sqrt(interp, v=UNDEFINED):
    if v is UNDEFINED:
        return UNDEFINED
    v = require_number(v, "$sqrt")
    if v < 0:
        raise JsonataError("$sqrt of negative number")
    return normalize_num(math.sqrt(v))


@_b("random", 0, ctx_inject=False)
def _f_random(interp):
    return interp.rng.random()


@_b("formatBase", 1)
def _f_format_base(interp, v=UNDEFINED, radix=10):
    if v is UNDEFINED:
        return UNDEFINED
    v = int(round(require_number(v, "$formatBase")))
    radix = int(require_number(radix, "$formatBase"))
    if not 2 <= radix <= 36:
        raise JsonataError("$formatBase radix must be in 2..36")
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    neg, v = v < 0, abs(v)
    out = ""
    while True:
        out = digits[v % radix] + out
        v //= radix
        if v == 0:
            break
    return ("-" if neg else "") + out


def parse_number_picture(picture):
    """Parse the supported XPath picture subset into
    (prefix, suffix, grouped, decimals, min_int, scale).

    Supported: literal prefix/suffix around ONE number part of '#', '0',
    ',' (grouping) and '.' decimals; '%' multiplies by 100 and '‰'
    (per-mille) by 1000 (XPath fn:format-number semantics); '0' count in
    the integer part sets the zero-padded minimum digits. Raises
    ValueError for pictures outside the subset (sub-pictures ';',
    multiple number parts, picture chars inside affixes)."""
    import re as _re

    m = _re.match(r"^([^0#.,;]*)([0#,]*(?:\.[0#]+)?)([^0#.,;]*)$", picture)
    if not m or not m.group(2):
        raise ValueError(f"unsupported $formatNumber picture {picture!r}")
    prefix, number, suffix = m.groups()
    scale = 1
    if "%" in prefix or "%" in suffix:
        scale = 100
    elif "‰" in prefix or "‰" in suffix:
        scale = 1000
    if "." in number:
        intpic, fracpic = number.split(".", 1)
        decimals = len([c for c in fracpic if c in "0#"])
    else:
        intpic, decimals = number, 0
    return (prefix, suffix, "," in intpic, decimals,
            max(intpic.count("0"), 1), scale)


@_b("formatNumber", 2)
def _f_format_number(interp, v=UNDEFINED, picture="0", options=UNDEFINED):
    if v is UNDEFINED:
        return UNDEFINED
    v = require_number(v, "$formatNumber")
    try:
        prefix, suffix, grouped, decimals, min_int, scale = \
            parse_number_picture(picture)
    except ValueError as exc:
        raise JsonataError(str(exc)) from exc
    v = v * scale
    s = f"{v:,.{decimals}f}" if grouped else f"{v:.{decimals}f}"
    if min_int > 1:
        # zero-pad the integer digits up to min_int (affects neither the
        # sign nor the grouping separators)
        neg = s.startswith("-")
        body = s[1:] if neg else s
        int_part, _, frac = body.partition(".")
        digits = int_part.replace(",", "")
        while len(digits) < min_int:
            digits = "0" + digits
        if grouped:
            rev = digits[::-1]
            int_part = ",".join(
                rev[i:i + 3] for i in range(0, len(rev), 3)
            )[::-1]
        else:
            int_part = digits
        s = ("-" if neg else "") + int_part + ("." + frac if frac else "")
    return prefix + s + suffix


# aggregation -----------------------------------------------------------------

def _num_list(arr, name):
    items = list(iter_items(arr))
    for v in items:
        if not is_number(v):
            raise JsonataError(f"{name} expects numbers")
    return items


@_b("sum", 1)
def _f_sum(interp, arr=UNDEFINED):
    if arr is UNDEFINED:
        return UNDEFINED
    return normalize_num(math.fsum(_num_list(arr, "$sum")))


@_b("max", 1)
def _f_max(interp, arr=UNDEFINED):
    if arr is UNDEFINED:
        return UNDEFINED
    items = _num_list(arr, "$max")
    return max(items) if items else UNDEFINED


@_b("min", 1)
def _f_min(interp, arr=UNDEFINED):
    if arr is UNDEFINED:
        return UNDEFINED
    items = _num_list(arr, "$min")
    return min(items) if items else UNDEFINED


@_b("average", 1)
def _f_average(interp, arr=UNDEFINED):
    if arr is UNDEFINED:
        return UNDEFINED
    items = _num_list(arr, "$average")
    if not items:
        return UNDEFINED
    return normalize_num(math.fsum(items) / len(items))


@_b("count", 1)
def _f_count(interp, arr=UNDEFINED):
    if arr is UNDEFINED:
        return 0
    return len(list(iter_items(arr)))


# boolean ---------------------------------------------------------------------

@_b("boolean", 1)
def _f_boolean(interp, v=UNDEFINED):
    if v is UNDEFINED:
        return UNDEFINED
    return boolean(v)


@_b("not", 1)
def _f_not(interp, v=UNDEFINED):
    if v is UNDEFINED:
        return UNDEFINED
    return not boolean(v)


@_b("exists", 1)
def _f_exists(interp, v=UNDEFINED):
    return v is not UNDEFINED


# array -----------------------------------------------------------------------

@_b("append", 2)
def _f_append(interp, a=UNDEFINED, b=UNDEFINED):
    if a is UNDEFINED:
        return b
    if b is UNDEFINED:
        return a
    out = ConsArray()
    out.extend(iter_items(a))
    out.extend(iter_items(b))
    return out


@_b("reverse", 1)
def _f_reverse(interp, arr=UNDEFINED):
    if arr is UNDEFINED:
        return UNDEFINED
    return ConsArray(reversed(list(iter_items(arr))))


@_b("shuffle", 1)
def _f_shuffle(interp, arr=UNDEFINED):
    if arr is UNDEFINED:
        return UNDEFINED
    items = list(iter_items(arr))
    interp.rng.shuffle(items)
    return ConsArray(items)


@_b("zip", 1, ctx_inject=False)
def _f_zip(interp, *arrays):
    lists = [list(iter_items(a)) if isinstance(a, list) else [a]
             for a in arrays]
    n = min((len(x) for x in lists), default=0)
    return ConsArray(ConsArray(col[i] for col in lists) for i in range(n))


@_b("sort", 1)
def _f_sort(interp, arr=UNDEFINED, comparator=UNDEFINED):
    if arr is UNDEFINED:
        return UNDEFINED
    items = list(iter_items(arr))
    if comparator is UNDEFINED:
        for v in items:
            if not (is_number(v) or isinstance(v, str)):
                raise JsonataError("$sort: default comparator needs "
                                   "numbers or strings")
        return ConsArray(sorted(items))
    # merge sort with user comparator(a, b) -> true if a should come AFTER b
    def merge(lo, hi):
        out = []
        i = j = 0
        while i < len(lo) and j < len(hi):
            swap = boolean(interp._call(comparator, [lo[i], hi[j]], None,
                                        "sort"))
            if swap:
                out.append(hi[j]); j += 1
            else:
                out.append(lo[i]); i += 1
        return out + lo[i:] + hi[j:]

    def msort(xs):
        if len(xs) <= 1:
            return xs
        mid = len(xs) // 2
        return merge(msort(xs[:mid]), msort(xs[mid:]))

    return ConsArray(msort(items))


# object ----------------------------------------------------------------------

@_b("keys", 1)
def _f_keys(interp, obj=UNDEFINED):
    if isinstance(obj, dict):
        return ConsArray(obj.keys())
    if isinstance(obj, list):
        seen: dict = {}
        for item in iter_items(obj):
            if isinstance(item, dict):
                for k in item:
                    seen[k] = True
        return ConsArray(seen.keys())
    return UNDEFINED


@_b("lookup", 2)
def _f_lookup(interp, obj=UNDEFINED, key=UNDEFINED):
    if isinstance(obj, dict):
        return obj.get(key, UNDEFINED)
    if isinstance(obj, list):
        out = JSeq()
        for item in iter_items(obj):
            if isinstance(item, dict) and key in item:
                seq_append(out, item[key])
        return out
    return UNDEFINED


@_b("spread", 1)
def _f_spread(interp, obj=UNDEFINED):
    if isinstance(obj, dict):
        return ConsArray({k: v} for k, v in obj.items())
    if isinstance(obj, list):
        out = ConsArray()
        for item in iter_items(obj):
            if isinstance(item, dict):
                out.extend({k: v} for k, v in item.items())
            else:
                out.append(item)
        return out
    return obj if obj is not UNDEFINED else UNDEFINED


@_b("merge", 1)
def _f_merge(interp, objs=UNDEFINED):
    if objs is UNDEFINED:
        return UNDEFINED
    out = {}
    for item in iter_items(objs):
        if not isinstance(item, dict):
            raise JsonataError("$merge expects objects")
        out.update(item)
    return out


def _hof_args(fn, args: list) -> list:
    """HOF invocation arity rule: a function passed to a higher-order
    builtin receives only as many arguments as it declares — a 1-param
    mapper gets just the item, never (item, index, array). Load-bearing
    once signatures exist: validating ``<n:n>`` against the full 3-arg
    HOF convention would be a spurious arity error."""
    if isinstance(fn, Lambda):
        return args[:len(fn.params)]
    if isinstance(fn, Partial):
        return args[:sum(1 for hole, _ in fn.bound if hole)]
    return args


@_b("each", 2)
def _f_each(interp, obj=UNDEFINED, fn=UNDEFINED):
    if not isinstance(obj, dict):
        return UNDEFINED
    out = JSeq()
    for k, v in obj.items():
        seq_append(out, interp._call(fn, _hof_args(fn, [v, k]), None,
                                     "each"))
    return out


@_b("sift", 2)
def _f_sift(interp, obj=UNDEFINED, fn=UNDEFINED):
    if not isinstance(obj, dict):
        return UNDEFINED
    out = {}
    for k, v in obj.items():
        if boolean(interp._call(fn, _hof_args(fn, [v, k, obj]), None,
                                "sift")):
            out[k] = v
    return out


# higher-order ----------------------------------------------------------------

@_b("map", 2)
def _f_map(interp, arr=UNDEFINED, fn=UNDEFINED):
    if arr is UNDEFINED:
        return UNDEFINED
    items = list(iter_items(arr))
    out = JSeq()
    for i, item in enumerate(items):
        seq_append(out, interp._call(fn, _hof_args(fn, [item, i, items]),
                                     None, "map"))
    return out


@_b("filter", 2)
def _f_filter(interp, arr=UNDEFINED, fn=UNDEFINED):
    if arr is UNDEFINED:
        return UNDEFINED
    items = list(iter_items(arr))
    out = JSeq()
    for i, item in enumerate(items):
        if boolean(interp._call(fn, _hof_args(fn, [item, i, items]), None,
                                "filter")):
            seq_append(out, item)
    return out


@_b("reduce", 2)
def _f_reduce(interp, arr=UNDEFINED, fn=UNDEFINED, init=UNDEFINED):
    if arr is UNDEFINED:
        return UNDEFINED
    items = list(iter_items(arr))
    if init is UNDEFINED:
        if not items:
            return UNDEFINED
        acc, rest = items[0], items[1:]
    else:
        acc, rest = init, items
    for item in rest:
        acc = interp._call(fn, [acc, item], None, "reduce")
    return unwrap(acc)


# date/time -------------------------------------------------------------------

@_b("now", 0, ctx_inject=False)
def _f_now(interp):
    return (
        _dt.datetime.now(_dt.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z"
    )


@_b("millis", 0, ctx_inject=False)
def _f_millis(interp):
    return int(time.time() * 1000)
