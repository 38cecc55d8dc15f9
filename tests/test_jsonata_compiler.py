"""Differential tests: the Column compiler and the interpreter must agree.

Each case evaluates one expression twice — interpreted over the Python value,
and compiled to a Column over ``try_parse_json(payload)`` — and compares
results. This is the §5.2 strategy from SURVEY.md: two independent backends,
one semantics.
"""

from __future__ import annotations

import json
import math

import pyspark.sql.functions as F
import pytest

from mqtt_streamr_spark.jsonata import jsonata
from mqtt_streamr_spark.jsonata.compiler import (
    NotCompilable,
    compile_column,
    compile_to_json,
)
from mqtt_streamr_spark.jsonata.values import UNDEFINED

DOC = {
    "user": "ada",
    "kind": "sensor/temp",
    "value": 21.5,
    "count": 3,
    "ok": True,
    "tags": ["a", "b", "c"],
    "nums": [1.5, 2.5, 3.0],
    "nested": {"k": 42, "name": "x y z", "deep": {"leaf": "v"}},
    "items": [{"p": 3, "q": "c"}, {"p": 1, "q": "a"}, {"p": 2, "q": "b"}],
    "empty": None,
    # array-truthiness fixtures (any-member-truthy, JSONata values.boolean)
    "zeros": [0],
    "blanks": [""],
    "flags": [False],
    "mixed": [0, 0, 2],
    "nested01": [[0], [2]],
    "nested00": [[0], [0]],
    # array leaves under multi-step OBJECT-ONLY paths: the r6 fast path
    # skipped sequence rules for these (r7 ADVICE fix)
    "lone": {"arr1": [5], "arr0": [], "arrs": ["only"], "arr2": [7, 8]},
}


def run_compiled(spark, expr, data):
    df = spark.createDataFrame([(json.dumps(data),)], "payload string")
    tc = compile_column(expr, F.try_parse_json("payload"),
                        raw_col=F.col("payload"))
    value = df.select(tc.col.alias("r")).collect()[0]["r"]
    return _to_python(value)


def _to_python(v):
    from pyspark.sql import Row

    if hasattr(v, "toPython"):  # VariantVal
        return v.toPython()
    if isinstance(v, Row):
        return {k: _to_python(x) for k, x in v.asDict().items()}
    if isinstance(v, dict):  # omap (ordered map) results
        return {k: _to_python(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_to_python(x) for x in v]
    return v


def assert_same(expected, actual, expr):
    if expected is UNDEFINED:
        assert actual is None, f"{expr}: expected undefined, got {actual!r}"
        return
    if isinstance(expected, bool):
        assert actual is expected, f"{expr}: {actual!r} != {expected!r}"
        return
    if isinstance(expected, (int, float)):
        assert actual is not None and math.isclose(
            float(expected), float(actual), rel_tol=1e-12
        ), f"{expr}: {actual!r} != {expected!r}"
        return
    if isinstance(expected, list):
        assert isinstance(actual, list) and len(actual) == len(expected), \
            f"{expr}: {actual!r} != {expected!r}"
        for e, a in zip(expected, actual):
            assert_same(e, a, expr)
        return
    if isinstance(expected, dict):
        actual = {k: v for k, v in (actual or {}).items() if v is not None}
        expected = {k: v for k, v in expected.items() if v is not None}
        assert set(actual) == set(expected), f"{expr}: keys {actual} != {expected}"
        for k in expected:
            assert_same(expected[k], actual[k], expr)
        return
    assert actual == expected, f"{expr}: {actual!r} != {expected!r}"


COMPILABLE = [
    # paths
    "user",
    "nested.k",
    "nested.deep.leaf",
    "missing",
    "nested.missing",
    "tags[0]",
    "tags[2]",
    "tags[-1]",
    "tags[9]",                                  # out of range -> undefined
    "tags[-9]",                                 # out of range -> undefined
    "tags[1+1]",                                # computed index, floor+wrap
    "tags[2-4]",                                # computed negative index
    "tags[0.5]",                                # fractional index floors
    "$",
    # index-ARRAY predicates: numeric-array predicate selects by position
    # (membership in item order, at-most-once, negatives from the end)
    "tags[[0..1]]",
    "tags[[1..2]]",
    "tags[[0,2]]",
    "nums[[0..1]]",
    "tags[[-2..-1]]",
    "tags[[0, -1]]",
    "tags[[2, 0]]",                             # item order, not index order
    "tags[[1..9]]",                             # overrun clipped
    "items[[0,2]].p",                           # nav over selected objects
    "tags[0..1]",                               # bare range predicate
    # range well-formedness
    "[5..1]",                                   # descending -> empty
    "[1..3, 7..9]",
    "$count([0..9])",
    # arithmetic / comparison / boolean
    "value * 2",
    "value + count",
    "nested.k - 40",
    "value > 20",
    "value > 100",
    "count = 3",
    "count != 3",
    "user = 'ada'",
    "kind = 'nope'",
    "missing = 3",
    "value > 20 and count = 3",
    "value > 100 or ok",
    "count % 2",
    "-value",
    "7 / 2",
    # strings
    "user & '-' & kind",
    "'v=' & value",
    "$uppercase(user)",
    "$lowercase('ABC')",
    "$trim('  a   b  ')",
    "$length(kind)",
    "$substring(kind, 0, 6)",
    "$substring(kind, -4)",
    "$substring(user, 1)",
    "$substringBefore(kind, '/')",
    "$substringAfter(kind, '/')",
    "$pad(user, 6, '*')",
    "$pad(user, -6)",
    "$contains(kind, 'temp')",
    "$contains(kind, /t.mp/)",
    "$split(kind, '/')",
    "$join($split(kind, '/'), '_')",
    "$replace(kind, '/', ':')",
    "$replace(nested.name, /\\s+/, '-')",
    "$base64encode(user)",
    "$base64decode($base64encode(user))",
    # numerics
    "$number('42') + 1",
    "$abs(0 - value)",
    "$floor(value)",
    "$ceil(value)",
    "$round(2.5)",
    "$round(3.5)",
    "$round(value, 0)",
    "$power(count, 2)",
    "$sqrt(16)",
    "$formatBase(255, 16)",
    '$formatNumber(value, "0.00")',
    '$formatNumber(value, "#,##0.0")',
    '$formatNumber(value * 1000, "#,##0")',
    '$formatNumber(count, "0")',
    '$formatNumber(2.5, "0")',      # exact .5 tie: half-even both backends
    '$formatNumber(3.5, "0")',
    '$formatNumber(-2.5, "0")',
    '$formatNumber(0 - value, "0.000")',
    '$formatNumber(1234567.891, "#,##0.00")',
    # round-5 picture widening: percent / per-mille / zero-padded
    # minimum digits / literal affixes (XPath fn:format-number subset)
    '$formatNumber(value, "0.0%")',
    '$formatNumber(value, "#,##0.00%")',
    '$formatNumber(value, "000.0")',
    '$formatNumber(0 - value, "000")',
    '$formatNumber(value * 100, "$#,##0.00")',
    '$formatNumber(value, "0.00 kg")',
    '$formatNumber(value, "0\u2030")',
    '$formatNumber(0 - value * 10000, "0000")',
    # arrays
    "$sum(nums)",
    "$max(nums)",
    "$min(nums)",
    "$average(nums)",
    "$count(nums)",
    "$count(tags)",
    "$count(missing)",
    "$count(user)",
    "$append([1,2],[3,4])",
    "$reverse([1,2,3])",
    "[1..4]",
    "'b' in tags",
    "2 in [1,2,3]",
    # conditionals / blocks / binds
    "value > 20 ? 'warm' : 'cold'",
    "ok ? value : 0",
    "($v := value * 2; $v + 1)",
    "($a := 1; $b := 2; $a + $b)",
    # chaining
    "user ~> $uppercase",
    "kind ~> $uppercase()",
    "$split(kind, '/') ~> $join('.')",
    # constructors
    '$merge([{"a": 1, "b": 2}, {"b": value, "c": user}])',
    '{"u": user, "v2": value * 2, "k": nested.k}',
    '{"a": {"b": value}}',
    "[value, count]",
    "[user, kind]",
    # higher-order functions
    "$map(nums, function($x){ $x * 2 })",
    "$map(nums, function($x, $i){ $x + $i })",
    "$map(tags, function($t){ $uppercase($t) })",
    "$filter(nums, function($x){ $x > 2 })",
    "$filter(nums, function($x, $i){ $i != 1 })",
    "$reduce(nums, function($a, $x){ $a + $x })",
    "$reduce(nums, function($a, $x){ $a + $x }, 100)",
    "$reduce(nums, function($a, $x){ $a * $x }, 1)",
    "$sum($map(nums, function($x){ $x * $x }))",
    "$sort(nums)",
    "$sort(tags)",
    "$sort(nums, function($a, $b){ $a > $b })",
    "$sort(nums, function($a, $b){ $a < $b })",
    "$zip(nums, nums)",
    "$zip(tags, tags)",
    "$lookup(nested, 'k')",
    # predicate filters / indexing / array paths
    "nums[$ > 2]",
    "items[p >= 2]",
    "items[p >= 2].q",
    "items[q = 'a' or q = 'b'].p",
    "items[-1]",
    "items[-1].q",
    "$filter(items, function($it){ $it.p >= 2 })",
    "$map(items, function($it){ $it.p })",
    "$sum($map(items, function($it){ $it.p }))",
    "$count(items[p > 0])",
    "Phone[type='mobile']",    # absent field -> empty (undefined)
    # order-by
    "nums^($)",
    "nums^(>$)",
    "items^(p)",
    "items^(>p)",
    "items^(q).q",                  # STRING keys sort too (r6 fuzz find)
    "items^(>q).q",
    # SEQUENCE semantics (r6 fuzz finds): name steps MAP over arrays,
    # singletons unwrap at the boundary, empty sequences are undefined
    "items.q",
    "items.p",
    "items.q[0]",                   # step-local index binding
    "(items.q)[0]",                 # parenthesized: index the sequence
    "$sum(items.p)",
    "$count(items.p)",
    "$join(items.q, '-')",
    "$map(zeros, function($x){ $x * 2 })",      # singleton -> item
    "$filter(nums, function($x){ $x > 2.9 })",  # singleton -> item
    "$filter(nums, function($x){ $x > 9 })",    # empty -> undefined
    "nums[$ > 2.9]",
    "nums[$ > 9]",
    "tags[[0, 9]]",                 # single index-array survivor unwraps
    "items[p = 1].q",
    "$string($map(zeros, function($x){ $x }))",
    "($map(zeros, function($x){ $x }) = 0)",
    "$each(nested.deep, function($v, $k){ $k })",
    # empty sequences propagate as undefined into functions; empty
    # ARRAYS are values and do not
    "$reverse(nums[$ > 9])",
    "$sort(nums[$ > 9])",
    "$sum(nums[$ > 9])",
    "$max(nums[$ > 9])",
    "$count(nums[$ > 9])",
    "$exists(nums[$ > 9])",
    "$reverse([])",
    "$sum([])",
    "$append(nums[$ > 2.9], nums[$ > 9])",      # undefined arg -> other
    "$append(nums[$ > 2.9], nums[$ > 2.9])",
    "$append(nums[$ > 9], nums[$ > 9])",
    "nested.k[0]",                  # index on a scalar: singleton rule
    # cons semantics: sequences flatten/drop, array VALUES nest,
    # undefined items drop, literal nulls stay, ranges are sequences
    "5..5",                          # bare singleton range unwraps
    "5..1",                          # bare empty range is undefined
    "[5..5]",
    "[[1,2],[3]]",                   # nested constructors stay nested
    "[nums]",                        # array value nests
    "[nums, nums]",
    "[missing, 1]",                  # undefined item drops
    "[missing]",
    "$count(5..5)",
    "[$split(kind, '/')]",           # $split result is an array value
    "[1..3][1]",
    # $reduce without init seeds with the lambda's own result kind
    "$reduce(tags, function($a, $b){ $a & $b })",
    "$reduce(tags, function($a, $b){ $a & '-' & $b })",
    "$reduce(nums, function($a, $b){ $a > $b ? $a : $b })",
    # numeric / string edge cases
    "$round(-2.5)",
    "$round(0.5)",
    "$round(1.5)",
    "$substring(kind, 2, 100)",
    "$substring('', 0, 3)",
    "$pad('x', 0)",
    "$split('a,b,,c', ',')",
    "$substringBefore(kind, 'zzz')",
    "$substringAfter(kind, 'zzz')",
    "$sum([1.5])",
    "$count([])",
    "value % 2",
    "-7 % 2",
    "$abs(-0.0)",
    "'' & missing",
    "$uppercase(missing)",
    "$boolean(0)",
    "$boolean('')",
    "$boolean('x')",
    "$boolean([])",
    "$boolean(nums)",
    # arrays are truthy iff ANY member is truthy (not merely non-empty)
    "$boolean(zeros)",
    "$boolean(blanks)",
    "$boolean(flags)",
    "$boolean(mixed)",
    "$boolean(nested01)",
    "$boolean(nested00)",
    "$not(zeros)",
    "zeros ? 'y' : 'n'",
    "mixed ? 'y' : 'n'",
    "zeros or false",
    "mixed and true",
    # group-by {} with scalar (aggregate) values — compiles on BOTH paths
    "items{q: $sum(p)}",
    "items{q: $count($)}",
    "items{'all': $sum(p)}",
    # functions of paths
    "$exists(missing)",
    "$exists(user)",
    "$exists(empty)",
    "$string(value)",
    "$string(count)",
    "$number(nested.k) * 2",
    # $match match-objects (compiled round 5; was interpreter-only).
    # The bare list shape is cardinality-independent (parity-exact for
    # 0/1/N matches); NAME navigation over the result needs singleton
    # collapse and stays interpreter-only (NOT_COMPILABLE below).
    "$match(kind, /t.mp/)",
    "$match(kind, /x+/)",                       # no match -> []
    "$match('ab12cd34', /\\d+/)",
    "$match('ab12', /\\d+/)",                   # single match: still a list
    "$count($match('ab12cd34', /\\d+/))",       # aggregate consumption
    "$count($match('ab', /x/))",                # zero matches -> 0
    "$match('a1b2c3', /(\\w)(\\d)/)",           # capture groups
    "$match('a1b2c3', /(\\w)(\\d)/, 2)",        # limit
    "$match('aa baa aa', /a+/)",                # repeated text: index walk
    "$match('concat cat cat', /c\\w+t/)",       # overlapping-ish occurrences
    "$match('a-b a-c', /a-(b|d)/)",             # alternation group
    "kind ~> $match(/e.s/)",                    # chained context form
    # ordered-object functions on the VARIANT path (compiled r6 via the
    # raw JSON string — key order is the whole point, and lists compare
    # order-sensitively here)
    "$keys($)",
    "$keys(nested)",
    "$keys(nested.deep)",
    "$keys(user)",                              # non-object -> undefined
    "$each(nested, function($v){ $string($v) })",
    "$each(nested, function($v, $k){ $k })",
    '$each(nested, function($v, $k){ $k & "=" & $string($v) })',
    '$sift($, function($v, $k){ $k = "user" })',
    "$sift(nested, function($v){ $boolean($v) })",
    "$spread(nested)",
    "$count($spread($))",
    # array/merged and dynamic-key forms (compiled r6, interpreter-exact)
    "$keys(items)",                             # merged member keys
    "$keys(nums)",                              # array of scalars -> []
    "$lookup(nested, user)",                    # dynamic key ('ada' absent)
    '$lookup(nested, "name")',
    '$lookup(nested, $lowercase("K"))',         # computed key
    "$merge([nested.deep, nested])",            # override + key-position
    "$merge([nested, nested.deep])",
    # omap composition: ordered-object ops consuming each other's output
    '$keys($sift(nested, function($v){ $boolean($v) }))',
    "$keys($merge([nested.deep, nested]))",
    '$lookup($merge([nested.deep, nested]), "leaf")',
    '$each($sift(nested, function($v, $k){ $k != "deep" }), '
    'function($v){ $string($v) })',
    "$count($spread($merge([nested.deep, nested])))",
    '$sift($merge([nested.deep, nested]), function($v, $k){ $k = "k" })',
    '$merge([$sift(nested, function($v, $k){ $k = "k" }), nested.deep])',
    # ** descendants on the VARIANT path (compiled r6: depth-bounded
    # pre-order recursion over raw JSON text). Aggregate contexts avoid
    # the singleton-unwrap rule so both backends agree exactly; these
    # also run on the TYPED path via test_typed_matches_interpreter.
    "$sum(**.k)",
    "$count(**.k)",
    "$sum(**.p)",
    "$count(**.p)",
    "$max(**.p)",
    "$count(nested.**.leaf)",
    "$count(items.**.p)",
    # r7: BARE ** compiled on the variant path (no trailing name step)
    "$count(**)",
    "$count(nested.**)",
    "$count(items.**)",
    "nested.deep.**",
    "$count(lone.**)",
    "missing.**",
    "user.**",
    # r7: object-path array-leaf sequence boundary (fast-path norm) —
    # singleton unwraps, empty is undefined, 2+ stays an array; a BARE
    # name keeps the raw array; index-selected arrays flatten one level
    "lone.arr1",
    "lone.arr0",
    "lone.arrs",
    "lone.arr2",
    "$string(lone.arr1)",
    "$exists(lone.arr0)",
    "zeros",
    "mixed",
    "$.zeros",
    "nested01[0]",
    "lone.arr2[0]",
    "lone.arr2[-1]",
    "lone.arr1[0]",
    # r7: sequence boundary across conditionals / $append (fuzzer finds):
    # a seq branch crosses ?: post-boundary; $append results are array
    # VALUES (never unwrapped), undefined args pass the other arg as-is
    "(ok ? lone.arrs : lone.arrs)",
    "(ok ? lone.arr0 : lone.arr0)",
    "$split((ok ? lone.arrs : lone.arrs), '/', 2)",
    "$append(zeros, lone.arr0)",
    "$append(lone.arr0, zeros)",
    "$append(lone.arr1, lone.arr0)",
    "$append(lone.arr0, lone.arr0)",
    "$append(items.p, lone.arr2)",
    # r7: group-by with SEQUENCE values (variant-encoded unwrap),
    # including `$` as the value (the post-boundary group context)
    "items{q: p}",
    "items{q: q}",
    'items{"all": p}',
    "nums{$string($): $}",
    "tags{$: $}",
    # r7: ANCHORED/\b $match compiles (split-segment index accounting)
    "$match(kind, /^sensor/)",
    "$match(kind, /^t.mp/)",
    "$match(kind, /t\\b/)",
    "$match(nested.name, /\\bz\\b/)[0].index",
    "$count($match(nested.name, /\\w+$/))",
    "$match(user, /a$/)",
    # r7: $reverse on variant/scalar args
    "$reverse(zeros)",
    "$reverse(lone.arr1)",
    "$reverse(nested.k)",
    "$reverse(missing)",
    "$append($reverse($reverse(zeros)), lone.arr0)",
    "$append(3, 9)",
    "$append(user, tags)",
    "$append(missing, nested.k)",
    # r7: strict `in` (ADVICE fix): cross-typed members never match;
    # non-array rhs is a singleton; path members splice
    "1 in ['1', 2]",
    "2 in ['1', 2]",
    "'1' in [1, '2']",
    "value in [21.5, 'x']",
    "user in ['ada', 7]",
    "'a' in tags",
    "'z' in tags",
    "3 in items.p",
    "9 in items.p",
    "2 in [items.p, 9]",
    "9 in [items.p, 9]",
    "'c' in [tags, 'z']",
    "count in count",
    "user in user",
    "true in [true, 1]",
    "1 in [true, 1]",
    "ok in [true]",
    "1 in [[1]]",
]


@pytest.mark.parametrize("expr", COMPILABLE)
def test_compiled_matches_interpreter(spark, expr):
    expected = jsonata(expr).evaluate(DOC)
    actual = run_compiled(spark, expr, DOC)
    assert_same(expected, actual, expr)


_REGEX_PATTERNS = [
    r"/\d+/", r"/\w+/", r"/\s+/", r"/[aeiou]/", r"/a.c/", r"/a.c/s",
    r"/ab/i", r"/^ab/m", r"/e$/m", r"/(a)(b)?/", r"/a{2,3}/", r"/a+?/",
    r"/[^x]/", r"/\bword\b/", r"/\-/", r"/[a-z]+/", r"/x|y/",
    r"/(?:gr)ey/", r"/\n/", r"/a\/b/", r"/\d{2}-\d{2}/", r"/(\w)\1/",
    r"/[\]]/", r"/\./", r"/§+/", r"/[0-9]٤?/", r"/[\d]+/", r"/\D\W/",
    # r8: the formerly-documented-approximation tails, now pinned —
    # JS whitespace set for \s/\S, ASCII-word \b/\B lookarounds
    r"/\S+/", r"/[\s]/", r"/a\b/", r"/x\B/", r"/\bé\b/",
]
_REGEX_INPUTS = [
    "abc abb 12-34 word sword", "AB ab\nxe\nend", "aa bb ٤٢ x",
    "line1\nline2e", "a/b a.c axc", "greyhound", "A§§B", "",
    # r8 tails: JS-only whitespace (\u00a0 \u2028 \ufeff),
    # Python-only whitespace (\x1c \x85), non-ASCII word chars
    # around boundaries
    "a\u00a0b\u2028c\ufeffd", "p\x1cq\x85r s\u00e9 x\u00e9x word\u00e9",
]
_REGEX_FUNCS = [
    "$contains(s, {rx})", "$split(s, {rx})", "$split(s, {rx}, 3)",
    '$replace(s, {rx}, "_")', '$replace(s, {rx}, "<$1>")',
    '$replace(s, {rx}, "$2-$1$$x\\\\")',
    "$count($match(s, {rx}))", "$match(s, {rx})[0].index",
]


@pytest.mark.slow  # r12 slow tier: corpus/recall sweep
def test_regex_fidelity_corpus(spark):
    """JS→Java regex fidelity audit (r7, SURVEY hard-part #3): every
    compilable (pattern, function, input) triple agrees between the
    Java-regex compiled path and the Python-re interpreter. Both are
    pinned to JS RegExp semantics — the reference's engine via jsonata
    1.6.4 — for the traps the audit found: ASCII \\d/\\w (interpreter
    rewrites Python's Unicode classes), and $replace templates where
    $N beyond the group count stays LITERAL (Java would throw,
    killing a vectorized batch). Anchored/lookaround $match and
    dynamic-replacement $replace fall back (NotCompilable) — the
    documented interpreter surface. r8 closes the two r7
    approximation tails and CHECKS them here: \\s/\\S pinned to the
    explicit JS whitespace set in BOTH engines (inputs include
    JS-only \\u00a0/\\u2028/\\ufeff and Python-only \\x1c/\\x85), and
    \\b/\\B pinned to ASCII-word lookarounds in the interpreter
    (inputs include non-ASCII word chars at boundaries); shared
    rewriter jsonata/regexes.py."""
    from mqtt_streamr_spark.jsonata.errors import JsonataError

    exprs, cols = [], []
    for rx in _REGEX_PATTERNS:
        for ftmpl in _REGEX_FUNCS:
            expr = ftmpl.format(rx=rx)
            try:
                tc = compile_column(expr, F.try_parse_json("payload"),
                                    raw_col=F.col("payload"))
                exprs.append(expr)
                cols.append(tc.col)
            except NotCompilable:
                pass
    assert len(exprs) >= 150  # the compiled surface must not quietly shrink
    n_checked = 0
    for s in _REGEX_INPUTS:
        doc = {"s": s}
        df = spark.createDataFrame([(json.dumps(doc),)], "payload string")
        for off in range(0, len(cols), 60):
            sel = [c.alias(f"c{j}")
                   for j, c in enumerate(cols[off:off + 60])]
            row = df.select(*sel).collect()[0]
            for j in range(len(sel)):
                expr = exprs[off + j]
                comp = _to_python(row[f"c{j}"])
                try:
                    interp = jsonata(expr).evaluate(doc)
                except JsonataError:
                    continue  # error->null divergence class (documented)
                assert_same(interp, comp, f"{expr} on {s!r}")
                n_checked += 1
    assert n_checked >= 1000


def test_object_root_flag_semantics(spark):
    """object_root=True (r7): bare names emit the single variant_get —
    identical results on object-rooted docs (the declared contract),
    names read as undefined on an array root (the documented tradeoff;
    default compile keeps full array-root mapping)."""
    doc = {"a": 1, "tags": ["x"], "lone": {"arr1": [5]}}
    for expr in ["a", "tags", "lone.arr1", "missing", "$string(a)"]:
        expected = jsonata(expr).evaluate(doc)
        df = spark.createDataFrame([(json.dumps(doc),)], "payload string")
        tc = compile_column(expr, F.try_parse_json("payload"),
                            object_root=True)
        actual = _to_python(df.select(tc.col.alias("r")).collect()[0]["r"])
        assert_same(expected, actual, f"object_root {expr}")
    # array root under the flag: undefined (default mode would map)
    arr_doc = [{"a": 1}, {"a": 2}]
    df = spark.createDataFrame([(json.dumps(arr_doc),)], "payload string")
    flagged = compile_column("a", F.try_parse_json("payload"),
                             object_root=True)
    assert df.select(flagged.col.alias("r")).collect()[0]["r"] is None
    full = compile_column("a", F.try_parse_json("payload"))
    got = _to_python(df.select(full.col.alias("r")).collect()[0]["r"])
    assert got == [1, 2]  # default mode maps over the array root


def test_ordered_object_ops_string_content_trap(spark):
    """A STRING field whose CONTENT is JSON text (an embedded serialized
    payload) must NOT be treated as an object/array by the ordered-object
    ops: get_json_object strips the quotes, so without the runtime
    schema_of_variant guard $keys('{\"a\":1}') would return ['a'] instead
    of the interpreter's undefined."""
    doc = {
        "emb_arr": '[{"a":1},{"b":2}]',
        "emb_obj": '{"x": 1}',
        "o": {"q": 7},
    }
    for expr in (
        "$keys(emb_arr)",
        "$keys(emb_obj)",
        '$lookup(emb_obj, $lowercase("X"))',
    ):
        expected = jsonata(expr).evaluate(doc)
        assert expected is UNDEFINED, expr  # interpreter: string -> undef
        assert run_compiled(spark, expr, doc) is None, expr
    # $each/$sift error in the interpreter on a string arg and $spread
    # passes it through; the compiled path's documented divergence class
    # maps all three to undefined — NEVER to the embedded content
    for expr in (
        '$sift(emb_obj, function($v){ true })',
        '$each(emb_obj, function($v){ $string($v) })',
        "$spread(emb_obj)",
    ):
        assert run_compiled(spark, expr, doc) is None, expr
    # $merge skips the string item instead of absorbing its content
    assert run_compiled(spark, "$merge([o, emb_obj])", doc) == {"q": 7}


DESC_DOC = {
    "b": {"k": 1, "a": {"k": 2, "z": [{"k": [30, 31]}, "noise"]}},
    "arr": [{"k": 3}, "txt", 5, [{"k": 4}]],
    "k": "top",
    "s": '{"k": 9}',   # embedded JSON text inside a STRING: never matched
    "n": {"k2": 7},
}


def test_variant_descendants_preorder_parity(spark):
    """Compiled variant-path ``**.k`` (r6): pre-order DOCUMENT order across
    sibling branches, array-valued matches flattened (seq_append), nested
    arrays recursed without pushing the array itself, and the
    embedded-JSON-string trap guarded — all exactly the interpreter's
    ``_descend`` semantics."""
    for expr in ("**.k", "b.**.k", "arr.**.k", "$count(**.k)"):
        expected = jsonata(expr).evaluate(DESC_DOC)
        actual = run_compiled(spark, expr, DESC_DOC)
        assert_same(expected, actual, expr)
    # spot-check the full order once, literally
    assert run_compiled(spark, "**.k", DESC_DOC) == \
        ["top", 1, 2, 30, 31, 3, 4]


def test_variant_descendants_scalar_base_undefined(spark):
    """`<scalar>.**.x` is undefined, and the embedded-JSON-string trap
    applies to the BASE too: `s.**.k` where s is a STRING whose content
    is JSON text must be undefined (the interpreter sees a string), not
    the embedded object's matches."""
    for expr in ("s.**.k", "k.**.x", "missing.**.x"):
        expected = jsonata(expr).evaluate(DESC_DOC)
        assert expected is UNDEFINED, expr
        assert run_compiled(spark, expr, DESC_DOC) is None, expr


def test_variant_descendants_depth_guard_raises(spark):
    """Rows nested deeper than VARIANT_DESC_DEPTH must fail LOUDLY (never
    silently truncate the descendant sequence): the correct escape hatch
    is the interpreter backend, and the error message says so."""
    from mqtt_streamr_spark.jsonata.compiler import VARIANT_DESC_DEPTH

    deep = {"k": 0}
    for _ in range(VARIANT_DESC_DEPTH + 2):
        deep = {"a": deep}
    with pytest.raises(Exception, match="exceeded max nesting"):
        run_compiled(spark, "**.k", deep)
    # ...and exactly-at-the-bound documents still evaluate fine
    at_bound = {"k": 1}
    for _ in range(VARIANT_DESC_DEPTH):
        at_bound = {"a": at_bound}
    assert run_compiled(spark, "$sum(**.k)", at_bound) == 1


def test_variant_descendants_null_match_divergence(spark):
    """JSON-null matches: the interpreter keeps them in the sequence; the
    compiled variant path drops them — the same documented null==absent
    divergence class as $exists/$keys. Assert it stays put."""
    doc = {"a": {"k": None}, "b": {"k": 1}}
    assert list(jsonata("**.k").evaluate(doc)) == [None, 1]
    # the null drop leaves a singleton sequence, which the result
    # boundary unwraps (sequence rules applied on top of the divergence)
    assert run_compiled(spark, "**.k", doc) == 1


def test_variant_descendants_match_flatten_bounded(spark):
    """Array-valued matches flatten recursively like the interpreter's
    seq_append — unrolled _SEQ_FLATTEN_UNROLL (=4) levels on the compiled
    path. Inside the bound: exact parity. Beyond it: the residual nesting
    survives — the documented bounded-unroll divergence class (same as
    _ARRAY_TRUTHY_UNROLL). Assert both stay put."""
    doc4 = {"k": [[[[40], 3], 2], 1]}          # 4 levels: exact
    assert run_compiled(spark, "**.k", doc4) == \
        list(jsonata("**.k").evaluate(doc4)) == [40, 3, 2, 1]
    doc6 = {"k": [[[[[[60]]]]]]}               # 6 levels: residual nesting
    assert jsonata("**.k").evaluate(doc6) == 60   # singleton-unwrapped
    # 4 flatten passes leave [[[60]]]; the boundary unwraps one more level
    assert run_compiled(spark, "**.k", doc6) == [[60]]


@pytest.mark.parametrize("expr", [
    "arr.q",            # splice array values into the sequence
    "one.q",            # singleton sequence -> the item
    "arr.q[0]",         # per-item index (step-local binding)
    "arr[0].q",         # index then name, result array splices
    "mixedarr.q",       # explicit JSON nulls are values: kept
    "$map(one.q, function($x){ $x + 1 })",
    "$sum(one.q)",
    "$sum(arr.q)",
    "missing.q",        # undefined lhs stays undefined
    "arr.missing",      # no matches -> undefined
])
def test_variant_array_navigation(spark, expr):
    """Name steps over arrays of objects on the VARIANT path (r6 fuzz
    finds): the dynamic sequence walk must agree with the interpreter —
    mapping, splicing, step-local indexes, null-keeping, and the
    singleton/empty boundary rules."""
    doc = {"arr": [{"q": [2, 3]}, {"q": [4]}], "one": [{"q": 5}],
           "mixedarr": [{"q": None}, {"q": 1}], "nested": {"k": 42}}
    expected = jsonata(expr).evaluate(doc)
    assert_same(expected, run_compiled(spark, expr, doc), expr)


NOT_COMPILABLE = [
    # descendants WITHOUT the raw JSON column (compile_column below passes
    # no raw_col): document order is unrecoverable from the variant
    # binary (sorted keys), so ** must refuse rather than emit a
    # wrong-order sequence
    "**.leaf",
    "$match(kind, /x*/)",            # zero-width-capable pattern
    "$match(kind, /s(?=e)/)",        # lookaround: zero-width context
    "$match('ab12cd34', /\\d+/).match",   # nav needs singleton collapse
    "$match('ab12cd34', /\\d+/).index",   # nav needs singleton collapse
    # ordered-object ops WITHOUT the raw JSON column (compile_column below
    # passes no raw_col): key order is unrecoverable from the variant
    # binary alone, so these must refuse rather than emit sorted keys
    "$keys(nested)",
    "$each(nested, function($v,$k){ $v })",
    "$sift(nested, function($v){ $boolean($v) })",
    "$spread(nested)",
    "$formatNumber(value, kind)",    # run-time picture -> interpreter
    '$formatNumber(value, "000,000.0")',  # grouped zero-pad: interpreter
    # r8 surface: function-value / runtime-validation constructs are
    # interpreter-only by design — the compiler must REFUSE so
    # transform_to_json(mode=auto) falls back, never miscompiles
    "$ ~> |$|{'x': 1}|",                       # transform operator
    "($t := |a|{'x': 1}|; $t(nested))",        # transform as a value
    "$map(items, $substring(?, 0, 2))",        # partial application
    "$map(items, function($v)<n:n>{ $v })",    # signature-checked lambda
]


@pytest.mark.parametrize("expr", NOT_COMPILABLE)
def test_not_compilable_raises(spark, expr):
    with pytest.raises(NotCompilable):
        compile_column(expr, F.lit(None))


def test_compile_to_json_object(spark):
    df = spark.createDataFrame([(json.dumps(DOC),)], "payload string")
    out = compile_to_json(
        '{"u": user, "v2": value * 2, "gone": missing}',
        F.try_parse_json("payload"),
    )
    got = json.loads(df.select(out.alias("j")).collect()[0]["j"])
    # undefined-valued fields are dropped from JSON output, like JSONata
    assert got == {"u": "ada", "v2": 43.0}


def test_type_error_divergence_documented(spark):
    """Interpreter raises on `1 + 'x'`; compiled path yields NULL. This is
    the documented divergence — assert it stays that way."""
    from mqtt_streamr_spark.jsonata.errors import JsonataError

    with pytest.raises(JsonataError):
        jsonata("1 + user").evaluate(DOC)
    assert run_compiled(spark, "1 + user", DOC) is None


def test_array_truthy_deep_nesting_divergence(spark):
    """Variant-path array truthiness unrolls 3 levels of nesting; at depth
    >=4 the compiled path falls back to non-empty while the interpreter
    recurses fully. Documented divergence — assert it stays put."""
    doc = {"deep4": [[[[0]]]]}
    assert jsonata("$boolean(deep4)").evaluate(doc) is False
    assert run_compiled(spark, "$boolean(deep4)", doc) is True


def test_typed_empty_struct_element_falsy(spark):
    """A typed struct element whose fields are all null/missing is an EMPTY
    object and therefore falsy (JSONata values.boolean), matching the
    variant path's cast(string) != '{}' check (round-2 ADVICE fix)."""
    from mqtt_streamr_spark.jsonata.compiler import compile_typed

    schema = "objs array<struct<a: long, b: string>>"
    for doc, expected in [
        ({"objs": [{}]}, False),
        ({"objs": [{"a": 1}]}, True),
        ({"objs": [{}, {"b": "x"}]}, True),
    ]:
        assert jsonata("$boolean(objs)").evaluate(doc) is expected
        tc = compile_typed(
            "$boolean(objs)", F.from_json(F.col("payload"), schema), schema
        )
        df = spark.createDataFrame([(json.dumps(doc),)], "payload string")
        got = df.select(tc.col.alias("r")).collect()[0]["r"]
        assert got is expected, f"{doc}: {got!r}"


def test_now_millis_compiled(spark):
    """$now/$millis compile to current_timestamp expressions (no exact
    differential possible — time moves between evaluations)."""
    import re
    import time

    df = spark.createDataFrame([("{}",)], "payload string")
    tc = compile_column("$millis()", F.try_parse_json("payload"))
    got = df.select(tc.col.alias("r")).collect()[0]["r"]
    assert abs(got / 1000.0 - time.time()) < 300, got
    tc2 = compile_column("$now()", F.try_parse_json("payload"))
    s = df.select(tc2.col.alias("r")).collect()[0]["r"]
    assert re.fullmatch(r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}Z", s), s


# --- typed fast path: same expressions over from_json struct ----------------

DOC_SCHEMA = (
    "user string, kind string, value double, count long, ok boolean, "
    "tags array<string>, nums array<double>, "
    "nested struct<k: long, name: string, deep: struct<leaf: string>>, "
    "items array<struct<p: long, q: string>>, empty string, "
    "zeros array<double>, blanks array<string>, flags array<boolean>, "
    "mixed array<double>, nested01 array<array<double>>, "
    "nested00 array<array<double>>, "
    "lone struct<arr1: array<double>, arr0: array<double>, "
    "arrs: array<string>, arr2: array<double>>"
)

# typed path cannot distinguish a JSON null from an absent field after
# from_json (both are SQL NULL); JSONata's $exists sees them differently
TYPED_DIVERGENT = {
    "$exists(empty)",
    # same root cause: typed $keys drops the null-valued "empty" key
    # (JSON null indistinguishable from absent in a struct); the variant
    # path keeps it via the raw-JSON ordered map
    "$keys($)",
    # typed $sift NULLs failing fields instead of removing them (a struct
    # cannot drop a field) — composing over the sifted struct surfaces
    # the null slot ($each iterates it; downstream ops see it); the
    # variant omap path removes entries for real and matches exactly
    '$each($sift(nested, function($v, $k){ $k != "deep" }), '
    'function($v){ $string($v) })',
    '$sift($merge([nested.deep, nested]), function($v, $k){ $k = "k" })',
}


@pytest.mark.parametrize("expr", COMPILABLE)
def test_typed_matches_interpreter(spark, expr):
    from mqtt_streamr_spark.jsonata.compiler import compile_typed

    if expr in TYPED_DIVERGENT:
        pytest.skip("typed path: JSON null indistinguishable from absent")
    try:
        tc = compile_typed(
            expr, F.from_json(F.col("payload"), DOC_SCHEMA), DOC_SCHEMA
        )
    except NotCompilable:
        pytest.skip("not typed-compilable (falls back to variant path)")
    df = spark.createDataFrame([(json.dumps(DOC),)], "payload string")
    actual = _to_python(df.select(tc.col.alias("r")).collect()[0]["r"])
    expected = jsonata(expr).evaluate(DOC)
    assert_same(expected, actual, expr)


TYPED_ONLY = [
    # group-by {} compiles ONLY with a declared schema; aggregate contexts
    # avoid JSONata's singleton-unwrap rule so both backends agree exactly.
    # (** descendants moved to COMPILABLE in r6: the variant path now
    # compiles them too, via depth-bounded raw-text recursion.)
    # $keys: schema order IS insertion order on the typed path. (On a
    # doc-with-null-fields, typed $keys drops the null-valued key — the
    # documented null==absent divergence, same as $exists.)
    "$keys(nested)",
    "$count($keys(nested.deep))",
    # `$$` in DERIVED contexts = the ORIGINAL root (r9 fix: it used to
    # alias the LOCAL context root — predicates/group-by/order-by/
    # transform updates silently diverged). Typed-only: the variant
    # path's unknown-type comparisons refuse and fall back.
    "nums[$ < $$.value]",
    "items[p < $$.value].p",
    "($x := $$; nums[$ < $x.value])",
    "nums{$string($ < $$.value): $sum($)}",
    "$ ~> |nested|{'r': $$.value}|",
    "$ ~> |items|{'r': $$.nested.k + p}|",
]


@pytest.mark.parametrize("expr", TYPED_ONLY)
def test_typed_only_descendants_groupby(spark, expr):
    from mqtt_streamr_spark.jsonata.compiler import compile_typed

    tc = compile_typed(
        expr, F.from_json(F.col("payload"), DOC_SCHEMA), DOC_SCHEMA
    )
    df = spark.createDataFrame([(json.dumps(DOC),)], "payload string")
    actual = _to_python(df.select(tc.col.alias("r")).collect()[0]["r"])
    expected = jsonata(expr).evaluate(DOC)
    assert_same(expected, actual, expr)
    # and the variant path must still refuse them (interpreter fallback)
    with pytest.raises(NotCompilable):
        compile_column(expr, F.lit(None))


@pytest.mark.slow  # r12 slow tier: corpus/recall sweep
def test_typed_coverage_is_substantial(spark):
    """Most of the compiled surface must also compile typed — guard against
    the typed path silently regressing to NotCompilable everywhere."""
    from mqtt_streamr_spark.jsonata.compiler import compile_typed

    ok = 0
    for expr in COMPILABLE:
        try:
            compile_typed(
                expr, F.from_json(F.col("payload"), DOC_SCHEMA), DOC_SCHEMA
            )
            ok += 1
        except NotCompilable:
            pass
    assert ok >= int(0.8 * len(COMPILABLE)), f"only {ok}/{len(COMPILABLE)}"


@pytest.mark.parametrize("expr", [
    "0 / 0",                   # interpreter raises per-row; compiled -> NULL
    "1 / 0",
    "7 % 0",
    "$number('not a number')", # interpreter raises D3030; compiled -> NULL
    "$number('')",
])
def test_documented_error_to_null_divergence(spark, expr):
    """Per-row errors cannot throw from a vectorized expression (one bad
    row must not kill the batch): the compiled path yields NULL (undefined)
    where the interpreter raises — the documented divergence from the
    module docstring. The important property: no crash, NULL result."""
    actual = run_compiled(spark, expr, DOC)
    assert actual is None, (expr, actual)


def test_each_typed_matches_interpreter(spark):
    """$each compiles on the typed path (static fields); interpreter is the
    reference for value+key iteration order (schema order = JSON order
    here)."""
    from mqtt_streamr_spark.jsonata.compiler import compile_typed

    doc = {"nested": {"k": 42, "name": "xy"}}
    schema = "nested struct<k: long, name: string>"
    for expr in (
        "$each(nested, function($v, $k){ $string($v) & ':' & $k })",
        "$each(nested, function($v){ $string($v) })",
    ):
        expected = jsonata(expr).evaluate(doc)
        df = spark.createDataFrame([(json.dumps(doc),)], "payload string")
        tc = compile_typed(
            expr, F.from_json(F.col("payload"), schema), schema
        )
        actual = _to_python(df.select(tc.col.alias("r")).collect()[0]["r"])
        assert_same(expected, actual, expr)


def test_sift_typed_matches_interpreter(spark):
    """$sift on the typed path: filtered fields become NULL (dropped by
    JSON serialization / the dict comparison), matching key-dropping."""
    from mqtt_streamr_spark.jsonata.compiler import compile_typed

    doc = {"scores": {"a": 80, "b": 30, "c": 95}}
    schema = "scores struct<a: long, b: long, c: long>"
    expr = "$sift(scores, function($v){ $v >= 50 })"
    expected = jsonata(expr).evaluate(doc)
    df = spark.createDataFrame([(json.dumps(doc),)], "payload string")
    tc = compile_typed(expr, F.from_json(F.col("payload"), schema), schema)
    actual = _to_python(df.select(tc.col.alias("r")).collect()[0]["r"])
    assert_same(expected, actual, expr)
    # keyed form
    expr2 = "$sift(scores, function($v, $k){ $k != 'b' })"
    expected2 = jsonata(expr2).evaluate(doc)
    tc2 = compile_typed(expr2, F.from_json(F.col("payload"), schema), schema)
    actual2 = _to_python(df.select(tc2.col.alias("r")).collect()[0]["r"])
    assert_same(expected2, actual2, expr2)


def test_explicit_null_field_truthiness(spark):
    """Pin the documented typed-path divergence for explicit-null fields
    (ADVICE r3): after ``from_json``, ``{"a": null}`` is indistinguishable
    from ``{}`` (both read as an all-NULL struct), so the TYPED compiled
    path treats it as an empty object -> falsy, while the interpreter (and
    the variant path, which preserves keys) sees an object with a key ->
    truthy. Same null==absent root cause as $exists/$keys above."""
    from mqtt_streamr_spark.jsonata.compiler import compile_typed

    doc = {"objs": [{"a": None}], "one": {"a": None}}
    schema = "objs array<struct<a: double>>, one struct<a: double>"
    df = spark.createDataFrame([(json.dumps(doc),)], "payload string")

    for expr in ("$boolean(objs)", "$boolean(one)"):
        # interpreter: key present -> truthy
        assert jsonata(expr).evaluate(doc) is True
        # typed compiled: all-NULL struct renders '{}' -> falsy
        tc = compile_typed(
            expr, F.from_json(F.col("payload"), schema), schema
        )
        assert df.select(tc.col.alias("r")).collect()[0]["r"] is False
        # variant compiled path keeps the key -> agrees with interpreter
        assert run_compiled(spark, expr, doc) is True

    # a genuinely empty object is falsy on EVERY path
    empty = {"objs": [{}], "one": {}}
    for expr in ("$boolean(objs)", "$boolean(one)"):
        assert jsonata(expr).evaluate(empty) is False
        tc = compile_typed(
            expr, F.from_json(F.col("payload"), schema), schema
        )
        df2 = spark.createDataFrame([(json.dumps(empty),)], "payload string")
        assert df2.select(tc.col.alias("r")).collect()[0]["r"] is False


TRANSFORM_TYPED = [
    # root-location transform operator: typed path compiles to a struct
    # rebuild (r8); variant path must refuse (function-value construct)
    "$ ~> |$|{'flag': value > 21}|",
    "$ ~> |$|{'value': value + 0.5, 'label': $uppercase(user)}, 'empty'|",
    "$ ~> |$|{'count': count * 2}, 'kind'|",
    "$ ~> |$|{}, ['tags','nums','items','zeros','blanks','flags',"
    "'mixed','nested01','nested00','lone']|",
    # update + delete of the SAME key: merge first, then delete wins
    "$ ~> |$|{'count': count + 1}, 'count'|",
    # r9: literal name-path locations — struct field match
    "$ ~> |nested|{'k': k * 2, 'tag': name}|",
    "$ ~> |nested|{'label': $uppercase(name)}, 'deep'|",
    # two-level path
    "$ ~> |nested.deep|{'leaf': $uppercase(leaf), 'n': 1}|",
    # array<struct> location: every element updated / deleted / appended
    "$ ~> |items|{'p': p * 10}, 'q'|",
    "$ ~> |items|{'big': p > 1}|",
    # no match -> the clone is returned unchanged
    "$ ~> |missing_key|{'x': 1}|",
    # non-object matches (scalar / array-of-scalar) are untouched
    "$ ~> |value|{'x': 1}|",
    "$ ~> |tags|{'x': 1}|",
    # composition over the transform result stays compiled (the result
    # carries its StructType): navigation + a chained second transform
    "($ ~> |$|{'v2': value * 2}|).v2",
    "($ ~> |nested|{'k2': k * 2}|).nested.k2",
    "$ ~> |$|{'v2': value * 2}| ~> |$|{'v3': v2 + 1}, 'items'|",
    "($ ~> |items|{'p2': p * 2}, 'q'|).items.p2",
    # r10: static boolean predicates on name steps — matched elements
    # updated/deleted, unmatched untouched (appends/deletes realized as
    # NULLs on the unmatched/matched side, dropped as absent)
    "$ ~> |items[p > 1]|{'big': true}|",
    "$ ~> |items[p > 1]|{'p': p * 10}, 'q'|",
    "$ ~> |items[q = 'a']|{'hit': 1, 'qq': $uppercase(q)}|",
    "$ ~> |items[p > 9]|{'never': 1}|",            # pred matches nothing
    "$ ~> |nested[k = 42]|{'tag': 'yes'}, 'name'|",  # pred on a struct field
    "$ ~> |nested[k = 0]|{'tag': 'yes'}, 'name'|",   # struct pred no-match
    # pred mid-path: only matched elements' sub-structs rebuilt
    "$ ~> |items[p > 1]|{'p2': p * 2}| ~> |$|{'n': 1}|",  # chained + pred
    # r10: wildcard steps — every object-valued field matches; scalars,
    # arrays-of-scalars and nested scalar arrays stay untouched
    "$ ~> |*|{'u': 1}|",
    "$ ~> |*|{'u': 1}, 'q'|",
    "$ ~> |*.deep|{'u': leaf}|",
    "$ ~> |nested.*|{'u2': 2}|",
    # r10: literal INDEX locations — floored, negative from the end,
    # out-of-range no match, singleton rule on struct fields
    "$ ~> |items[0]|{'first': true}|",
    "$ ~> |items[-1]|{'last': p}, 'q'|",
    "$ ~> |items[1.5]|{'x': 1}|",
    "$ ~> |items[9]|{'x': 1}|",
    "$ ~> |items[-9]|{'x': 1}|",
    "$ ~> |nested[0]|{'x': 1}|",
    "$ ~> |nested[-1]|{'x': 1}|",
    "$ ~> |nested[2]|{'x': 1}|",
    "$ ~> |tags[0]|{'x': 1}|",
    # r11: COMPUTED index locations — context-free numeric predicates
    # (outer := bindings, arithmetic over them) resolve the target
    # position at runtime: floored, negative from the end, out-of-range
    # no match, singleton rule on struct fields
    "($i := 1; $ ~> |items[$i]|{'picked': true}|)",
    "($i := -1; $ ~> |items[$i]|{'last': p}, 'q'|)",
    "($i := 9; $ ~> |items[$i]|{'x': 1}|)",
    "($i := 0.9; $ ~> |items[$i]|{'x': 1}|)",
    "($i := 0; $ ~> |items[$i + 1]|{'p': p * 10}|)",
    "($i := 0; $ ~> |nested[$i]|{'x': 1}|)",
    "($i := 2; $ ~> |nested[$i]|{'x': 1}|)",
    "($i := 0; $ ~> |tags[$i]|{'x': 1}|)",
    # r11: outer bindings inside BOOLEAN location predicates (threaded
    # through ctx.down's binding copy)
    "($t := 1; $ ~> |items[p > $t]|{'big': true}|)",
    "($t := 1; $u := 'a'; $ ~> |items[p > $t and q = $u]|{'hit': 1}|)",
]


@pytest.mark.parametrize("expr", TRANSFORM_TYPED)
def test_typed_transform_operator(spark, expr):
    from mqtt_streamr_spark.jsonata.compiler import compile_typed

    tc = compile_typed(
        expr, F.from_json(F.col("payload"), DOC_SCHEMA), DOC_SCHEMA
    )
    df = spark.createDataFrame([(json.dumps(DOC),)], "payload string")
    actual = _to_python(df.select(tc.col.alias("r")).collect()[0]["r"])
    expected = jsonata(expr).evaluate(DOC)
    assert_same(expected, actual, expr)
    with pytest.raises(NotCompilable):
        compile_column(expr, F.lit(None))


# ---- r12: one-parse SQL emission of the descendants walks -------------------


def _canon_lambda_vars(txt: str) -> str:
    """Rename lambda variables (PySpark's x_N/y_N and the emitter's jdvN)
    by first appearance so structurally identical renders compare equal."""
    import re

    seen: dict = {}

    def sub(m):
        k = m.group(0)
        if k not in seen:
            seen[k] = f"v{len(seen)}"
        return seen[k]

    return re.sub(r"\b[xy]_\d+\b|\bjdv\d+\b", sub, txt)


def test_desc_sql_emitters_match_column_builders(spark):
    """The r12 one-parse SQL emitters must produce the EXACT expression the
    Column builders produce — pinned by canonicalized Catalyst-render
    equality (modulo lambda-variable names) at depths 1 and 2, for the
    bare-** walk and the **.k walk with and without a rest path. This is
    the equivalence proof that lets the front doors skip thousands of
    py4j construction round-trips per query build."""
    import mqtt_streamr_spark.jsonata.compiler as C

    for d in (1, 2):
        old = C._render_expr_sql(
            C._desc_all_variant_cols(F.col("s_in"), F.col("v_in"), d))
        new = C._render_expr_sql(
            F.expr(C._sql_desc_all("s_in", "v_in", d, d)))
        assert _canon_lambda_vars(old) == _canon_lambda_vars(new), f"all d{d}"
    for d, steps in ((1, ["k"]), (2, ["k"]), (1, ["k", "a", "b"])):
        old = C._render_expr_sql(
            C._desc_matches_variant_cols(F.col("s_in"), F.col("v_in"),
                                         steps, d))
        rest = C._json_path(steps[1:]) if steps[1:] else None
        new = C._render_expr_sql(C._flatten_variant_seq(F.expr(
            C._sql_desc_matches("s_in", "v_in", steps[0], rest, d, d))))
        assert _canon_lambda_vars(old) == _canon_lambda_vars(new), \
            f"matches d{d} {steps}"


def test_desc_sql_fast_path_fires_on_query_shapes(spark):
    """The standard query shapes (plain raw column / get_json_object
    prefix / the type-guarded when()) must take the fast path — i.e.
    their input columns splice (render round-trips). If this breaks, the
    front doors silently fall back and the build-time win is lost."""
    import mqtt_streamr_spark.jsonata.compiler as C

    for c in (
        F.col("payload"),
        F.get_json_object(F.col("payload"), "$.outer"),
        F.try_parse_json(F.col("payload")),
        F.try_variant_get(F.try_parse_json(F.col("payload")), "$.outer",
                          "variant"),
    ):
        assert C._splice_sql(c) is not None


def test_desc_unsafe_or_failing_inputs_fall_back(spark):
    """Unsafe spliced literals (quote in a match step) and emitter
    failures must fall back to the Column builders with identical
    results — the fast path is an optimization, never a semantics
    gate."""
    import json as _json

    import mqtt_streamr_spark.jsonata.compiler as C

    doc = {"we'ird": 1, "b": {"we'ird": 2}}
    df = spark.createDataFrame([(_json.dumps(doc),)], "payload string")
    raw = F.col("payload")
    root = F.try_parse_json(F.col("payload"))
    # a quoted key fails the safe-charset gate -> Column builder path
    got = df.select(F.to_json(C._desc_matches_variant(
        raw, root, ["we'ird"], 3)).alias("r")).collect()[0]["r"]
    assert _json.loads(got) == [1, 2]
    # forced emitter failure on the bare walk -> fallback, same result
    orig = C._sql_desc_all
    C._sql_desc_all = lambda *a, **k: (_ for _ in ()).throw(RuntimeError())
    try:
        got2 = df.select(F.size(C._desc_all_variant(
            raw, root, 3)).alias("n")).collect()[0]["n"]
    finally:
        C._sql_desc_all = orig
    got3 = df.select(F.size(C._desc_all_variant(
        raw, root, 3)).alias("n")).collect()[0]["n"]
    assert got2 == got3 == 3  # 1 (root's we'ird) + b + b's we'ird
