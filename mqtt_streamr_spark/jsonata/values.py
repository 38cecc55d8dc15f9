"""Value-domain helpers shared by the interpreter: the undefined sentinel,
sequence flattening rules, truthiness, and string conversion — the JSONata
semantics SURVEY.md §7 ranks as the hardest correctness surface."""

from __future__ import annotations

import json
import math

from mqtt_streamr_spark.jsonata.errors import JsonataError


class _Undefined:
    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):
        return "<undefined>"

    def __bool__(self):
        return False


UNDEFINED = _Undefined()


class ConsArray(list):
    """Array produced by an explicit ``[...]`` constructor — unlike arrays
    read from data, constructed arrays are NOT flattened into enclosing
    path-result sequences."""


class JSeq(list):
    """A path-result sequence. keep=True (trailing ``[]``) forces array
    output even for singletons."""

    def __init__(self, items=(), keep: bool = False):
        super().__init__(items)
        self.keep = keep


def is_seq(v) -> bool:
    return isinstance(v, JSeq)


def seq_append(seq: JSeq, value) -> None:
    """Append a step result to a path sequence, flattening data arrays and
    nested sequences but keeping constructed arrays intact."""
    if value is UNDEFINED:
        return
    if isinstance(value, JSeq):
        seq.extend(value)
        if value.keep:
            seq.keep = True
    elif isinstance(value, list) and not isinstance(value, ConsArray):
        for item in value:
            seq_append(seq, item)
    else:
        seq.append(value)


def unwrap(value):
    """Collapse a sequence to its JSONata value: empty -> undefined,
    singleton -> the value (unless keep), else a plain list."""
    if isinstance(value, JSeq):
        if value.keep:
            return list(value)
        if len(value) == 0:
            return UNDEFINED
        if len(value) == 1:
            return value[0]
        return list(value)
    return value


def iter_items(value):
    """Iterate a value as a sequence: arrays/sequences yield elements,
    scalars yield themselves, undefined yields nothing."""
    if value is UNDEFINED:
        return
    if isinstance(value, (JSeq, list)):
        yield from value
    else:
        yield value


def boolean(value) -> bool:
    """$boolean truthiness (JSONata 1.6): empty seq/str/array/object, 0,
    false, null, undefined and functions are false."""
    value = unwrap(value)
    if value is UNDEFINED or value is None:
        return False
    if isinstance(value, bool):
        return value
    if isinstance(value, (int, float)):
        return value != 0
    if isinstance(value, str):
        return len(value) > 0
    if isinstance(value, list):
        return any(boolean(v) for v in value)
    if isinstance(value, dict):
        return len(value) > 0
    if callable(value):
        return False
    return True


def is_number(v) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def normalize_num(v):
    """JSON-number normalization: integral floats print as integers in JS."""
    if isinstance(v, float) and not math.isinf(v) and not math.isnan(v) and v.is_integer():
        return int(v)
    return v


def to_json_value(value):
    """Convert an evaluation result to a plain JSON-able Python value
    (sequences -> lists, integral floats -> ints); undefined -> UNDEFINED."""
    value = unwrap(value)
    if value is UNDEFINED or value is None:
        return value
    if isinstance(value, bool):
        return value
    if is_number(value):
        return normalize_num(value)
    if isinstance(value, list):
        return [None if (x := to_json_value(v)) is UNDEFINED else x for v in value]
    if isinstance(value, dict):
        out = {}
        for k, v in value.items():
            jv = to_json_value(v)
            if jv is not UNDEFINED:
                out[k] = jv
        return out
    return value


def jstring(value, pretty: bool = False) -> str:
    """$string semantics: strings pass through; everything else is
    JSON-serialized (numbers in JS shortest form)."""
    value = unwrap(value)
    if value is UNDEFINED:
        return ""
    if isinstance(value, str):
        return value
    jv = to_json_value(value)
    if jv is UNDEFINED:
        return ""
    if callable(jv):
        return ""
    return json.dumps(jv, separators=(", ", ": ") if pretty else (",", ":"),
                      indent=2 if pretty else None, ensure_ascii=False)


def require_number(v, op: str):
    v = unwrap(v)
    if not is_number(v):
        raise JsonataError(f"{op}: expected a number, got {type(v).__name__}")
    return v


def require_string(v, op: str):
    """T0410 parity for builtins with an ``s``-typed parameter (reference
    signatures like ``<s-:s>``): a non-string argument is a JSONata type
    error, not a Python crash. Found by fuzz: a kind-changing transform
    update (``|x|{'name': 7}|``) fed the int to a chained
    ``$uppercase(name)`` and the raw AttributeError escaped
    ``JsonataError`` handling (r10)."""
    v = unwrap(v)
    if not isinstance(v, str):
        raise JsonataError(f"{op}: expected a string, got {type(v).__name__}")
    return v
