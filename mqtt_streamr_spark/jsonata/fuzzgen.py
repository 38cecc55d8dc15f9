"""Random JSONata expression generator for differential fuzzing.

Generates syntactically valid JSONata 1.6 expressions over a fixed
document, spanning the COMPILED surface (SURVEY.md §2.6): paths,
predicates, index arrays, order-by, arithmetic, comparison/boolean,
string/numeric/array/object functions, HOF lambdas, variable binds,
blocks, conditionals and ``~>`` chaining. Deterministic productions
only — ``$random``/``$now``/``$millis``/``$shuffle`` are excluded so
both backends can be compared value-for-value.

Two consumers share this grammar:
- ``tests/test_properties.py`` (hypothesis: seed -> expression), and
- ``scripts/fuzz_jsonata.py`` (batched deep-fuzz CLI — hundreds of
  expressions per Spark action).

The generator is seeded-``random.Random`` based (NOT hypothesis
strategies) so the deep-fuzz script needs no test dependencies.
"""

from __future__ import annotations

import random

# The fuzz document. Mirrors tests/test_jsonata_compiler.py DOC so any
# divergence found here reproduces directly in the differential suite.
FUZZ_DOC = {
    "user": "ada",
    "kind": "sensor/temp",
    "value": 21.5,
    "count": 3,
    "ok": True,
    "tags": ["a", "b", "c"],
    "nums": [1.5, 2.5, 3.0],
    "nested": {"k": 42, "name": "x y z", "deep": {"leaf": "v"}},
    "items": [{"p": 3, "q": "c"}, {"p": 1, "q": "a"}, {"p": 2, "q": "b"}],
    "zeros": [0],
    "mixed": [0, 0, 2],
    # array leaves reachable only through multi-step OBJECT paths: these
    # exercise the fast-path splice/singleton/empty boundary that the r6
    # grammar missed (r7, ADVICE fix)
    "lone": {"arr1": [5], "arr0": [], "arrs": ["only"], "arr2": [7, 8]},
}

_NUM_ATOMS = ["value", "count", "nums[0]", "nested.k", "items[1].p",
              "2", "7.5", "0", "-3", "10", "lone.arr1",
              "$count(**)", "$count(nested.**)",
              # `$$` = ORIGINAL root even in derived contexts (r9 fix) —
              # composition places these inside predicates/group-by/HOFs
              "$$.value", "$$.nested.k"]
_STR_ATOMS = ["user", "kind", "tags[1]", "'lit'", "nested.name",
              "nested.deep.leaf", "items[0].q", "'x/y/z'", "lone.arrs",
              "$$.user"]
_BOOL_ATOMS = ["ok", "true", "false"]
# array atoms by element kind (so lambda bodies can type-match)
_ARRNUM_ATOMS = ["nums", "items.p", "[1..4]", "mixed", "zeros",
                 "lone.arr1", "lone.arr0", "lone.arr2"]
_ARRSTR_ATOMS = ["tags", "items.q", "['a','b','b']", "lone.arrs"]
_OBJ_ATOMS = ["nested", "items[0]", "nested.deep"]

# small deterministic pictures / patterns for format & regex productions
_PICTURES = ["'#,##0.00'", "'0000'", "'#0.0%'"]
# includes \s / \b / \w atoms (r9, VERDICT r8 #8): the shared JS-fidelity
# rewriter (jsonata/regexes.py) pins both engines to JS semantics for
# these classes, and the fuzz grammar must keep guarding that the way
# lone.* atoms guard sequence rules. FUZZ_DOC strings carry plain
# spaces, '/', and digits; patterns below hit the rewritten classes.
_REGEXES = ["/se?n/", "/[aeiou]/", "/\\d+/", "/a.b/",
            "/\\s/", "/\\s+/", "/\\bx/", "/z\\b/", "/\\w+/",
            "/[^\\s]/", "/\\b\\w\\b/", "/\\S+/"]


def _n(rng: random.Random, d: int) -> str:
    """Numeric-valued expression."""
    if d <= 0:
        return rng.choice(_NUM_ATOMS)
    pick = rng.randrange(18)
    if pick < 4:
        return rng.choice(_NUM_ATOMS)
    if pick < 7:
        op = rng.choice(["+", "-", "*"])
        return f"({_n(rng, d - 1)} {op} {_n(rng, d - 1)})"
    if pick == 7:
        # division / modulo with non-zero literal denominators only
        op = rng.choice(["/", "%"])
        return f"({_n(rng, d - 1)} {op} {rng.choice(['2', '4', '2.5'])})"
    if pick == 8:
        fn = rng.choice(["$sum", "$max", "$min", "$average", "$count"])
        return f"{fn}({_arr_num(rng, d - 1)})"
    if pick == 9:
        fn = rng.choice(["$abs", "$floor", "$ceil", "$round"])
        return f"{fn}({_n(rng, d - 1)})"
    if pick == 10:
        return f"$round({_n(rng, d - 1)}, {rng.choice([1, 2])})"
    if pick == 11:
        return rng.choice([
            f"$power({_n(rng, 0)}, 2)",
            f"$sqrt($abs({_n(rng, d - 1)}) + 1)",
        ])
    if pick == 12:
        return f"$length({_s(rng, d - 1)})"
    if pick == 13:
        return f"$count({_arr(rng, d - 1)})"
    if pick == 14:
        return f"({_b(rng, d - 1)} ? {_n(rng, d - 1)} : {_n(rng, d - 1)})"
    if pick == 15:
        return rng.choice([
            f"($v := {_n(rng, d - 1)}; $v + {_n(rng, 0)})",
            f"($v := {_n(rng, d - 1)}; $w := {_n(rng, 0)}; $v * $w)",
            f"$lookup(nested, 'k') + {_n(rng, 0)}",
        ])
    if pick == 16:
        init = rng.choice(["", ", 0", ", 100"])
        return (f"$reduce({_arr_num(rng, d - 1)}, "
                f"function($a, $b){{ $a + $b }}{init})")
    return f"$number($string({_n(rng, d - 1)}))"


def _s(rng: random.Random, d: int) -> str:
    """String-valued expression."""
    if d <= 0:
        return rng.choice(_STR_ATOMS)
    pick = rng.randrange(14)
    if pick < 4:
        return rng.choice(_STR_ATOMS)
    if pick == 4:
        return f"({_s(rng, d - 1)} & {_s(rng, d - 1)})"
    if pick == 5:
        fn = rng.choice(["$uppercase", "$lowercase", "$trim"])
        return f"{fn}({_s(rng, d - 1)})"
    if pick == 6:
        return f"$substring({_s(rng, d - 1)}, {rng.choice([0, 1, -2])}, {rng.choice([2, 3])})"
    if pick == 7:
        fn = rng.choice(["$substringBefore", "$substringAfter"])
        return f"{fn}({_s(rng, d - 1)}, '/')"
    if pick == 8:
        return f"$pad({_s(rng, 0)}, {rng.choice([-8, 8])}, '*')"
    if pick == 9:
        return rng.choice([
            f"$join({_arr_str(rng, d - 1)}, '-')",
            f"$reduce({_arr_str(rng, d - 1)}, "
            "function($a, $b){ $a & $b })",
        ])
    if pick == 10:
        return f"$string({_n(rng, d - 1)})"
    if pick == 11:
        pat = rng.choice(["'a'", rng.choice(_REGEXES)])
        return f"$replace({_s(rng, d - 1)}, {pat}, 'Z')"
    if pick == 12:
        return rng.choice([
            f"$base64decode($base64encode({_s(rng, d - 1)}))",
            f"$formatBase({rng.choice(['10', '42', '255'])}, "
            f"{rng.choice(['2', '8', '16'])})",
            f"$formatNumber({_n(rng, 0)}, {rng.choice(_PICTURES)})",
            "$lookup(nested, '%s')" % rng.choice(["name", "nope"]),
            "$lookup(items[1], 'q')",
            # $string of a VARIANT object re-serializes with sorted keys
            # (documented divergence) — stick to objects whose key order
            # is already sorted / single-key
            f"$string({rng.choice(['nested.deep', 'items[0]'])})",
        ])
    return f"({_b(rng, d - 1)} ? {_s(rng, d - 1)} : {_s(rng, d - 1)})"


def _b(rng: random.Random, d: int) -> str:
    """Boolean-valued expression."""
    if d <= 0:
        return rng.choice(_BOOL_ATOMS)
    pick = rng.randrange(12)
    if pick < 2:
        return rng.choice(_BOOL_ATOMS)
    if pick < 5:
        op = rng.choice(["<", "<=", ">", ">=", "=", "!="])
        return f"({_n(rng, d - 1)} {op} {_n(rng, d - 1)})"
    if pick == 5:
        op = rng.choice(["=", "!="])
        return f"({_s(rng, d - 1)} {op} {_s(rng, d - 1)})"
    if pick == 6:
        op = rng.choice(["and", "or"])
        return f"({_b(rng, d - 1)} {op} {_b(rng, d - 1)})"
    if pick == 7:
        return f"$not({_b(rng, d - 1)})"
    if pick == 8:
        pat = rng.choice(["'a'", "'en'", rng.choice(_REGEXES)])
        return f"$contains({_s(rng, d - 1)}, {pat})"
    if pick == 9:
        path = rng.choice(["user", "missing", "nested.k", "nested.nope",
                           "items[9]", "tags[1]"])
        return f"$exists({path})"
    if pick == 10:
        return f"({_s(rng, 0)} in {_arr_str(rng, d - 1)})"
    return f"$boolean({rng.choice(['mixed', 'zeros', 'tags', _n(rng, 0)])})"


def _lambda_num(rng: random.Random) -> str:
    """A one-arg numeric lambda body over $x."""
    op = rng.choice(["+", "-", "*"])
    return f"function($x){{ $x {op} {rng.choice(['1', '2', '0.5'])} }}"


def _lambda_bool(rng: random.Random) -> str:
    cmp_ = rng.choice(["<", "<=", ">", ">=", "!="])
    return f"function($x){{ $x {cmp_} {rng.choice(['1', '2', '2.5'])} }}"


def _arr_num(rng: random.Random, d: int) -> str:
    if d <= 0:
        return rng.choice(_ARRNUM_ATOMS)
    pick = rng.randrange(10)
    if pick < 3:
        return rng.choice(_ARRNUM_ATOMS)
    if pick == 3:
        if rng.random() < 0.25:   # 2-arg lambda: ($x, $i) index binding
            return (f"$map({_arr_num(rng, d - 1)}, "
                    f"function($x, $i){{ $x + $i }})")
        return f"$map({_arr_num(rng, d - 1)}, {_lambda_num(rng)})"
    if pick == 4:
        if rng.random() < 0.25:
            return (f"$filter({_arr_num(rng, d - 1)}, "
                    f"function($x, $i){{ $i < 2 }})")
        return f"$filter({_arr_num(rng, d - 1)}, {_lambda_bool(rng)})"
    if pick == 5:
        return f"$sort({_arr_num(rng, d - 1)})"
    if pick == 6:
        return f"$reverse({_arr_num(rng, d - 1)})"
    if pick == 7:
        return f"$append({_arr_num(rng, d - 1)}, {_arr_num(rng, d - 1)})"
    if pick == 8:
        return rng.choice([
            "nums[$ > 2]", "items[p > 1].p", "items^(p).p", "items^(>p).p",
            "nums[[0..1]]", "mixed[[0, 2]]",
            f"[{_n(rng, 0)}, {_n(rng, 0)}]",
        ])
    return f"[{rng.choice(['1..3', '0..4', '2..2'])}]"


def _arr_str(rng: random.Random, d: int) -> str:
    if d <= 0:
        return rng.choice(_ARRSTR_ATOMS)
    pick = rng.randrange(8)
    if pick < 3:
        return rng.choice(_ARRSTR_ATOMS)
    if pick == 3:
        return f"$sort({_arr_str(rng, d - 1)})"
    if pick == 4:
        return f"$reverse({_arr_str(rng, d - 1)})"
    if pick == 5:
        lim = rng.choice(["", ", 1", ", 2"])
        return f"$split({_s(rng, d - 1)}, '/'{lim})"
    if pick == 6:
        return rng.choice([
            "items[p >= 2].q", "items^(p).q", "items^(>q).q",
            "tags[[0, 2]]", "$keys(nested)", "$keys(items[0])",
            "$split(kind, /[/e]/)",
        ])
    return f"$append({_arr_str(rng, d - 1)}, {_arr_str(rng, d - 1)})"


def _arr(rng: random.Random, d: int) -> str:
    pick = rng.randrange(6)
    if pick < 2:
        return _arr_num(rng, d)
    if pick < 4:
        return _arr_str(rng, d)
    if pick == 4:
        return "$zip(tags, nums)"
    return "$spread(nested.deep)" if rng.random() < 0.5 else "$each(nested.deep, function($v, $k){ $k & '=' & $string($v) })"


def _obj(rng: random.Random, d: int) -> str:
    if d <= 0:
        return rng.choice(_OBJ_ATOMS)
    pick = rng.randrange(6)
    if pick < 2:
        return rng.choice(_OBJ_ATOMS)
    if pick == 2:
        return f"{{'a': {_n(rng, d - 1)}, 'b': {_s(rng, d - 1)}}}"
    if pick == 3:
        return f"$merge([{_obj(rng, d - 1)}, {{'z': {_n(rng, 0)}}}])"
    if pick == 4:
        return rng.choice([
            "$sift(nested, function($v){ $exists($v.leaf) })",
            "$sift(items[0], function($v, $k){ $k = 'q' })",
            "$merge([nested.deep, items[0]])",
        ])
    return rng.choice(["items{q: p}", "items{q: $sum(p)}",
                       "items{'n': $count($)}"])


# nested-location transform fodder (r9): update values reference the
# MATCH's own fields (the update evaluates with the match as context),
# keys/deletes chosen per location. "missing"/"value"/"tags" locations
# pin no-match / non-object-match semantics (clone returned untouched).
_XFORM_LOCS = {
    "nested": (["'t1'", "'k'", "'name'"],
               ["k", "k * 2", "$uppercase(name)", "name & '!'",
                "k > 10", "7"],
               ["deep", "name", "t9"]),
    "nested.deep": (["'leaf'", "'t1'"],
                    ["$uppercase(leaf)", "leaf & 'x'", "'z'", "1"],
                    ["leaf", "t9"]),
    "items": (["'p'", "'q'", "'t1'"],
              ["p * 10", "q & 'z'", "p > 1", "'c'"],
              ["q", "p", "t9"]),
    "missing": (["'t1'"], ["1"], ["t9"]),
    "value": (["'t1'"], ["1"], ["t9"]),
    "tags": (["'t1'"], ["1"], ["t9"]),
    # r10: static boolean predicates on name steps (matched subset
    # updated, unmatched untouched) and wildcard steps (every
    # object-valued field matches; scalars/arrays-of-scalars untouched)
    "items[p > 1]": (["'p'", "'t1'"],
                     ["p * 10", "q & 'z'", "p > 1", "'c'"],
                     ["q", "p", "t9"]),
    "items[q = 'a']": (["'q'", "'t1'"],
                       ["q & 'z'", "p > 1", "1"], ["q", "t9"]),
    "items[p > 9]": (["'t1'"], ["1"], ["q", "t9"]),
    "nested[k = 42]": (["'t1'", "'name'"],
                       ["k * 2", "$uppercase(name)"], ["deep", "t9"]),
    "nested[k = 0]": (["'t1'"], ["1"], ["name", "t9"]),
    "*": (["'t1'", "'u'"], ["1", "'x'", "$exists(k)"],
          ["q", "name", "t9"]),
    # r10: literal index locations (floored, negative from the end,
    # out-of-range / singleton-rule shapes)
    "items[0]": (["'p'", "'t1'"], ["p * 10", "q & 'z'"], ["q", "t9"]),
    "items[-1]": (["'t1'"], ["p > 1", "1"], ["p", "t9"]),
    "items[1.5]": (["'t1'"], ["1"], ["q", "t9"]),
    "items[9]": (["'t1'"], ["1"], ["t9"]),
    "nested[0]": (["'t1'"], ["k * 2"], ["name", "t9"]),
    "nested[2]": (["'t1'"], ["1"], ["t9"]),
    "*.deep": (["'t1'"], ["$uppercase(leaf)", "1"], ["leaf", "t9"]),
    "nested.*": (["'t1'"], ["1", "leaf & 'x'"], ["leaf", "t9"]),
}


def _transform(rng: random.Random, d: int) -> str:
    """Transform operator: random literal updates + deletes over the doc,
    at the root (r8) or a literal name-path location (r9). On the TYPED
    backend these compile to in-place struct rebuilds
    (_c_transform_apply); kind-changing updates of existing fields are
    NotCompilable-skipped by design, and the variant backend skips all
    of them (function-value construct)."""
    if rng.randrange(2):
        if rng.randrange(4) == 0:
            # r11: COMPUTED locations — outer := bindings reach the
            # location predicate (boolean) or resolve a runtime index
            # (numeric, floored, negative from the end); both compile
            # on the typed backend (_transform_loc_dynamic)
            i = rng.choice(["0", "1", "-1", "2", "9", "0.9", "-2"])
            upd = "{" + rng.choice(
                ["'t1': 1", "'p': p * 10", "'t1': q & 'z'"]) + "}"
            return rng.choice([
                f"($i := {i}; $ ~> |items[$i]|{upd}|)",
                f"($i := {i}; $ ~> |items[$i + 1]|{upd}|)",
                f"($i := {i}; $ ~> |nested[$i]|{{'t1': 1}}|)",
                f"($t := {i}; $ ~> |items[p > $t]|{upd}|)",
                f"($t := {i}; $u := 'a'; "
                f"$ ~> |items[p > $t and q = $u]|{upd}|)",
            ])
        loc = rng.choice(sorted(_XFORM_LOCS))
        keys, vals, victims = _XFORM_LOCS[loc]
        pairs = [f"{rng.choice(keys)}: {rng.choice(vals)}"
                 for _ in range(rng.randrange(1, 3))]
        upd = "{" + ", ".join(pairs) + "}"
        first = (f"$ ~> |{loc}|{upd}|" if rng.randrange(2)
                 else f"$ ~> |{loc}|{upd}, '{rng.choice(victims)}'|")
        if rng.randrange(3) == 0:
            # CHAINED transform (r10: the _let-bound intermediate —
            # chains must stay linear AND correct)
            loc2 = rng.choice(sorted(_XFORM_LOCS))
            k2, v2, _ = _XFORM_LOCS[loc2]
            upd2 = "{" + f"{rng.choice(k2)}: {rng.choice(v2)}" + "}"
            return f"{first} ~> |{loc2}|{upd2}|"
        return first
    pairs = []
    for _ in range(rng.randrange(1, 3)):
        key = rng.choice(["'t1'", "'t2'", "'user'", "'count'",
                          "'value'", "'ok'"])
        pick = rng.randrange(3)
        val = (_n(rng, d - 1) if pick == 0
               else _s(rng, d - 1) if pick == 1
               else _b(rng, d - 1))
        pairs.append(f"{key}: {val}")
    upd = "{" + ", ".join(pairs) + "}"
    dels = rng.randrange(3)
    if dels == 0:
        return f"$ ~> |$|{upd}|"
    if dels == 1:
        victim = rng.choice(["kind", "zeros", "mixed", "lone", "t9"])
        return f"$ ~> |$|{upd}, '{victim}'|"
    second = rng.choice(["nums", "items", "nested"])
    return f"$ ~> |$|{upd}, ['tags', '{second}']|"


_KINDS = ("num", "str", "bool", "arrnum", "arrstr", "arr", "obj", "chain",
          "transform")


def gen_expr(seed: int, depth: int = 3, kind: str | None = None) -> str:
    """Deterministically generate one JSONata expression from a seed."""
    rng = random.Random(seed)
    k = kind or rng.choice(_KINDS)
    if k == "num":
        return _n(rng, depth)
    if k == "str":
        return _s(rng, depth)
    if k == "bool":
        return _b(rng, depth)
    if k == "arrnum":
        return _arr_num(rng, depth)
    if k == "arrstr":
        return _arr_str(rng, depth)
    if k == "arr":
        return _arr(rng, depth)
    if k == "obj":
        return _obj(rng, depth)
    if k == "transform":
        return _transform(rng, depth)
    # ~> chaining compositions
    return rng.choice([
        f"{_n(rng, depth - 1)} ~> $string ~> $length",
        f"{_s(rng, depth - 1)} ~> $uppercase",
        f"{_arr_num(rng, depth - 1)} ~> $sort ~> $reverse",
        f"{_arr_str(rng, depth - 1)} ~> $join('-')",
    ])
