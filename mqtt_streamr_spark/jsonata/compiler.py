"""JSONata AST -> native Spark Column compiler (the fast path).

The reference evaluates JSONata by tree-walking per message
(bin/mqtt-streamr.js:158); this compiler instead emits a Catalyst expression
tree over a VariantType input column, so the transform runs entirely
JVM-side (vectorized parquet scan + Catalyst expression eval; variant
expressions are not whole-stage-codegen'd but never leave the JVM) — no
Python in the hot path, ~100x the throughput of an interpreted UDF at
scale. Asserted in tests/test_plans.py.

Coverage (v0): paths over objects (incl. [n] index), literals, arithmetic,
comparisons, and/or/not, string concat, conditionals with boolean conditions,
object/array constructors with literal keys, variable binds/blocks (inline
substitution), ``~>`` chaining, and most of the §2.6 function library.
Anything else raises :class:`NotCompilable` and the caller falls back to the
interpreter UDF (streaming/transform.py) — same results, slower path.

Known, documented divergences from the interpreter (exercised and asserted
in tests/test_jsonata_compiler.py):
- type errors (e.g. ``1 + 'x'``) yield SQL NULL (undefined) instead of
  raising, because a vectorized expression cannot throw per-row;
- constructed objects represent absent optional fields as NULL; ``to_json``
  drops them (ignoreNullFields), matching JSONata's undefined-dropping for
  sink output;
- array truthiness is any-member-truthy (JSONata 1.6 values.boolean) with
  nested-array recursion unrolled ``_ARRAY_TRUTHY_UNROLL`` (=3) levels on
  the variant path; arrays nested deeper than 3 fall back to non-empty;
- variant-path ``**.k`` (r6) unrolls to ``VARIANT_DESC_DEPTH`` (=10)
  nesting levels — deeper rows fail LOUDLY (assert_true) rather than
  silently truncate — and flattens array-valued matches
  ``_SEQ_FLATTEN_UNROLL`` (=4) levels; JSON-null matches drop (the
  null==absent class). Bare ``**`` (no trailing name step) stays on the
  interpreter.
"""

from __future__ import annotations

import itertools as _itertools
import re as _re
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import Column

from mqtt_streamr_spark.jsonata.errors import NotCompilable
from mqtt_streamr_spark.jsonata.parser import parse

_SIMPLE_NAME = _re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

# kinds: variant | number | string | boolean | array<elem> | object | null


@dataclass
class TypedCol:
    col: Column
    kind: str
    elem: str | None = None  # element kind for arrays
    fields: list[str] | None = None  # field names for constructed objects
    dtype: object | None = None  # Spark DataType on the TYPED path (schema
    #                              known statically; enables codegen)
    seq_nav_unsafe: bool = False  # array whose JSONata NAME-step navigation
    #   must apply singleton-collapse/empty->undefined (sequence semantics a
    #   static Column type cannot express) — navigation raises NotCompilable
    #   instead of silently diverging; whole-value/aggregate/indexed uses
    #   stay compiled ($match results)
    is_seq: bool = False  # array that is a JSONata SEQUENCE (HOF/predicate/
    #   name-step-mapping result), not an array VALUE: at the result
    #   boundary an empty sequence is undefined and a singleton is its
    #   item (_seq_boundary); internal consumers ($sum, indexing, further
    #   HOFs) keep operating on the array form


@dataclass
class Ctx:
    """Compile-time environment: the input context column plus let-bindings.
    root_kind tracks the context value's kind ('variant' for the input
    message; the element kind inside predicate filters over typed arrays).
    root_schema is the Spark DataType of the context on the TYPED path."""

    root: Column
    bindings: dict[str, TypedCol] = field(default_factory=dict)
    root_kind: str = "variant"
    root_schema: object | None = None
    # the context root is a JSONata SEQUENCE (group-by value position):
    # `$` referencing it gets is_seq, so the boundary applies the
    # per-group singleton-unwrap (r7)
    root_is_seq: bool = False
    # raw JSON STRING of the message root (key order preserved) — enables
    # compiling the ordered-object functions ($keys/$each/$sift/$spread)
    # on the variant path, whose binary encoding sorts object keys. Only
    # valid while root IS the message root: derived contexts that rebase
    # the root (predicates, group-by) drop it.
    raw: Column | None = None
    # caller-declared "the message root is a JSON OBJECT" (r7): bare
    # name lookups then emit ONLY the single variant_get — no array-root
    # dynamic-walk ELSE branch per name reference (the r6 walk costs
    # ~25% on name-dense transforms, BENCH r6 jsonata_hof_compiled).
    # Like `raw`, only meaningful while root IS the message root;
    # derived contexts leave it False.
    object_root: bool = False
    # the ORIGINAL evaluation root, for `$$` (r9 — ADVICE-class fix:
    # `$$` used to compile to the LOCAL context root, silently diverging
    # from the interpreter inside predicates / mapped paths / group-by /
    # transform updates). Derived contexts rebase `root` but must carry
    # these through (Ctx.down()); None means root IS the original root.
    root0: Column | None = None
    root0_kind: str = "variant"
    root0_schema: object | None = None

    def down(self, **kw) -> "Ctx":
        """A DERIVED context: rebased root, carried-through `$$` root.
        kwargs as for Ctx(); bindings default to a copy of this ctx's."""
        kw.setdefault("bindings", dict(self.bindings))
        kw.setdefault("root0",
                      self.root if self.root0 is None else self.root0)
        kw.setdefault("root0_kind",
                      self.root_kind if self.root0 is None
                      else self.root0_kind)
        kw.setdefault("root0_schema",
                      self.root_schema if self.root0 is None
                      else self.root0_schema)
        return Ctx(**kw)


def compile_column(source_or_ast, input_col: Column,
                   raw_col: Column | None = None,
                   object_root: bool = False) -> TypedCol:
    """Compile a JSONata expression to a typed Column over a variant input.
    ``raw_col``: the original JSON STRING the variant was parsed from;
    when provided, the ordered-object functions compile too (they need
    source key order, which the variant encoding discards).
    ``object_root=True`` declares every message root is a JSON object
    (schema knowledge, like transform_to_json's ``schema``): bare-name
    lookups then skip the array-root mapping branch — smaller plans,
    r5-shaped per-name cost. Array-rooted messages under this flag read
    names as undefined instead of mapping over items."""
    ast = parse(source_or_ast) if isinstance(source_or_ast, str) else source_or_ast
    return _seq_boundary(_compile(
        ast, Ctx(root=input_col, raw=raw_col, object_root=object_root)))


def compile_typed(source_or_ast, input_col: Column, schema) -> TypedCol:
    """TYPED fast path: compile over a struct column with a known schema
    (``from_json(payload, schema)``) instead of a variant. Field access
    becomes plain struct navigation, arithmetic gets concrete types, and
    the whole transform stays inside whole-stage codegen — the path to use
    at 100 TB when the message schema is declared. Schema-absent fields
    compile to NULL (JSONata undefined), matching schemaless semantics."""
    from pyspark.sql.types import StructType

    ast = parse(source_or_ast) if isinstance(source_or_ast, str) else source_or_ast
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    return _seq_boundary(_compile(
        ast,
        Ctx(root=input_col, root_kind="object", root_schema=schema),
    ))


def _typed_from(col: Column, dt) -> TypedCol:
    """Map a Spark DataType to the compiler's kind lattice."""
    import pyspark.sql.types as T

    if isinstance(dt, T.StringType):
        return TypedCol(col, "string")
    if isinstance(dt, (T.DoubleType,)):
        return TypedCol(col, "number")
    if isinstance(dt, (T.FloatType, T.LongType, T.IntegerType, T.ShortType,
                       T.ByteType, T.DecimalType)):
        return TypedCol(col.cast("double"), "number")
    if isinstance(dt, T.BooleanType):
        return TypedCol(col, "boolean")
    if isinstance(dt, T.NullType):
        return TypedCol(col, "null")
    if isinstance(dt, T.ArrayType):
        et = dt.elementType
        if isinstance(et, (T.FloatType, T.LongType, T.IntegerType,
                           T.ShortType, T.ByteType, T.DecimalType)):
            col = F.transform(col, lambda x: x.cast("double"))
            et = T.DoubleType()
        elem = _typed_from(F.lit(None), et)
        return TypedCol(col, f"array<{elem.kind}>", elem=elem.kind, dtype=et)
    if isinstance(dt, T.StructType):
        return TypedCol(col, "object", fields=dt.fieldNames(), dtype=dt)
    raise NotCompilable(f"no typed mapping for Spark type {dt}")


def _typed_navigate(col: Column, dt, steps: list) -> TypedCol:
    """Walk name/index steps through a known schema; absent names are
    JSONata undefined (NULL). A name step over an array<struct> maps over
    the members (JSONata sequence semantics: remaining steps apply
    per-item, missing dropped, array-valued results spliced one level,
    is_seq so the boundary applies singleton/empty rules)."""
    import pyspark.sql.types as T

    for i, s in enumerate(steps):
        if isinstance(s, int):
            if not isinstance(dt, T.ArrayType):
                raise NotCompilable("index step on non-array typed value")
            # try_: out-of-range is JSONata undefined, and ANSI
            # element_at would raise. Negative indexes count from the
            # end in both JSONata and element_at (r7).
            col = F.try_element_at(col, F.lit(s + 1 if s >= 0 else s))
            dt = dt.elementType
        else:
            if isinstance(dt, T.ArrayType) \
                    and isinstance(dt.elementType, T.StructType):
                rest = steps[i:]
                out = _typed_navigate(F.lit(None), dt.elementType, rest)
                if out.kind == "null":
                    return TypedCol(F.lit(None), "null")
                def _nav_fn(et, r):
                    # closure factory — a default-arg lambda would be
                    # 2-arity and F.transform would bind the index to it
                    return lambda x: _typed_navigate(x, et, r).col

                mapped = F.transform(col, _nav_fn(dt.elementType, rest))
                kept = F.filter(mapped, lambda v: v.isNotNull())
                if out.kind.startswith("array"):
                    # splice array-valued results into the sequence
                    return TypedCol(F.flatten(kept),
                                    f"array<{out.elem or 'variant'}>",
                                    elem=out.elem, dtype=out.dtype,
                                    is_seq=True)
                return TypedCol(kept, f"array<{out.kind}>", elem=out.kind,
                                dtype=out.dtype, is_seq=True)
            if not isinstance(dt, T.StructType):
                raise NotCompilable("name step on non-struct typed value")
            if s not in dt.fieldNames():
                return TypedCol(F.lit(None), "null")
            col, dt = col.getField(s), dt[s].dataType
    return _typed_from(col, dt)


def compile_to_json(source_or_ast, input_col: Column,
                    raw_col: Column | None = None) -> Column:
    """Compile to a JSON-string output column (the sink payload shape the
    reference publishes, bin/mqtt-streamr.js:193)."""
    tc = compile_column(source_or_ast, input_col, raw_col=raw_col)
    return to_json_string(tc)


def project_to_schema(tc: TypedCol, schema) -> Column:
    """Struct-direct output adapter (r12): project a TYPED transform
    result onto a declared output schema, producing EXACTLY what
    ``from_json(to_json_string(tc), schema)`` produces for that result —
    declared fields read by name (absent ones are NULL, a NULL object is
    a NULL struct, per-element in nested arrays) — without serializing
    every row to a JSON string and re-parsing it. The JSON round-trip is
    lossless for the supported shapes (numbers/booleans/strings round-trip
    bit-exact through Jackson; ``ignoreNullFields`` drops what from_json
    reads back as NULL), so skipping it cannot change values; shapes
    whose round-trip COULD coerce (a compiled field type that differs
    from the declared type, sequence-boundary results) raise
    ``NotCompilable`` instead of silently diverging — callers needing
    those keep the JSON surface.

    Supported result shapes: a struct with a statically known
    ``StructType`` (transform-operator results), a constructed object
    (``fields`` known, leaf types carried by the underlying columns), and
    the group-by constructor's ``map<string, scalar>`` encoding (declared
    fields read via ``element_at``, matching from_json's by-name lookup
    since group keys are array_distinct'd — no duplicate-key ambiguity).
    """
    import pyspark.sql.types as T

    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)

    def _project_value(col: Column, src, tgt) -> Column:
        if isinstance(tgt, T.StructType):
            if not isinstance(src, T.StructType):
                raise NotCompilable(
                    f"declared struct where compiled type is {src}")
            return _project_struct(col, src, tgt)
        if isinstance(tgt, T.ArrayType):
            if not isinstance(src, T.ArrayType):
                raise NotCompilable(
                    f"declared array where compiled type is {src}")
            if src.elementType == tgt.elementType:
                return col
            return F.transform(
                col,
                lambda x: _project_value(x, src.elementType,
                                         tgt.elementType),
            )
        if src != tgt:
            # from_json's parse-coercions for mismatched types are not
            # cast semantics; require exact agreement
            raise NotCompilable(
                f"declared type {tgt} != compiled type {src}")
        return col

    def _project_struct(col: Column, src: T.StructType,
                        tgt: T.StructType) -> Column:
        names = set(src.fieldNames())
        out = []
        for f in tgt.fields:
            if f.name in names:
                out.append(
                    _project_value(col.getField(f.name),
                                   src[f.name].dataType,
                                   f.dataType).alias(f.name))
            else:
                out.append(F.lit(None).cast(f.dataType).alias(f.name))
        # from_json(NULL) is a NULL struct, not a struct of NULLs
        return F.when(col.isNotNull(), F.struct(*out))

    if tc.kind not in ("object", "omap"):
        raise NotCompilable(
            f"project_to_schema over kind {tc.kind} (objects only)")
    # The result tree is referenced once per declared field; without a
    # let-binding each getField COPIES the whole transform subtree (and
    # a CodegenFallback from_json inside it then re-parses per field —
    # measured 10x on the chained-transform queries). _let evaluates the
    # result ONCE per row, exactly like the old JSON surface's single
    # to_json(tc.col) did.
    if isinstance(tc.dtype, T.StructType):
        return _let(tc.col, lambda c: _project_struct(c, tc.dtype, schema))
    if tc.kind == "object" and tc.fields is not None:
        # constructed object: field names known, leaf types carried by
        # the columns themselves; a declared/actual type mismatch
        # surfaces as an analysis error in the caller's plan, and the
        # old-vs-new parity suite pins value equality
        have = set(tc.fields)

        def _from_fields(c: Column) -> Column:
            out = [
                (c.getField(f.name) if f.name in have
                 else F.lit(None).cast(f.dataType)).alias(f.name)
                for f in schema.fields
            ]
            return F.when(c.isNotNull(), F.struct(*out))

        return _let(tc.col, _from_fields)

    # group-by constructor / omap: map<string, value> — by-name lookup,
    # exactly what from_json does on the serialized object (group keys
    # are distinct by construction, so there is no duplicate-key case)
    def _from_map(c: Column) -> Column:
        out = [
            F.element_at(c, F.lit(f.name)).alias(f.name)
            for f in schema.fields
        ]
        return F.when(c.isNotNull(), F.struct(*out))

    return _let(tc.col, _from_map)


def to_json_string(tc: TypedCol) -> Column:
    # ignoreNullFields passed explicitly everywhere: constructed objects
    # represent ABSENT optional fields as NULL (module docstring), so the
    # serialization must drop them even if the user session flips
    # spark.sql.jsonGenerator.ignoreNullFields to false.
    if tc.is_seq and tc.kind.startswith("array"):
        # JSONata sequence rules, string-side (no variant round-trip):
        # empty -> undefined (NULL payload), singleton -> the item's JSON
        return _let(tc.col, lambda c: F.when(
            F.size(c) == 1,
            to_json_string(_elem_tc(F.element_at(c, 1),
                                    tc.elem or "variant", tc.dtype)),
        ).when(
            F.size(c) > 1, F.to_json(c, {"ignoreNullFields": "true"})))
    if tc.kind in ("object", "omap") or tc.kind.startswith("array"):
        return F.to_json(tc.col, {"ignoreNullFields": "true"})
    if tc.kind == "variant":
        # NOTE: F.cast("string", col) is NOT a cast here — it resolves to
        # the identity on variant input (r7 find); Column.cast is.
        return tc.col.cast("string")
    if tc.kind == "string":
        # JSON-escape by serializing {"v": s} and stripping the 5-char
        # prefix + trailing brace; j is let-bound so it is built once, and
        # a NULL string yields NULL (to_json drops null fields, which
        # would otherwise substr('{}') into a bogus empty payload)
        j = F.to_json(F.struct(tc.col.alias("v")),
                      {"ignoreNullFields": "true"})
        stripped = F.element_at(
            F.transform(
                F.array(j), lambda s: s.substr(F.lit(6), F.length(s) - 6)
            ),
            1,
        )
        return F.when(tc.col.isNull(), F.lit(None)).otherwise(stripped)
    # numbers / booleans serialize as their SQL string form
    return as_string(tc)


# --- coercions ---------------------------------------------------------------

def as_number(tc: TypedCol) -> Column:
    if tc.kind == "number":
        return tc.col
    if tc.kind == "variant":
        return F.try_variant_get(tc.col, "$", "double")
    if tc.kind == "string":
        return tc.col.try_cast("double")
    if tc.kind == "null":
        return F.lit(None).cast("double")
    if tc.is_seq and tc.kind.startswith("array"):
        # a singleton sequence is its item; numbering a larger sequence
        # is a JSONata type error -> NULL (error->null divergence class)
        return as_number(_seq_scalar(tc))
    raise NotCompilable(f"cannot use kind {tc.kind} as number")


def as_string(tc: TypedCol) -> Column:
    """$string semantics: numbers print JS-style (no trailing .0)."""
    if tc.kind == "string":
        return tc.col
    if tc.kind == "number":
        c = tc.col.cast("double")
        return F.when(
            c == F.floor(c),
            c.cast("decimal(38,0)").cast("string"),
        ).otherwise(c.cast("string"))
    if tc.kind == "boolean":
        return F.when(tc.col, "true").when(~tc.col, "false")
    if tc.kind == "variant":
        # string variant -> raw string; others -> JSON text
        s = F.try_variant_get(tc.col, "$", "string")
        return s
    if tc.is_seq and tc.kind.startswith("array"):
        # sequence rules: empty -> undefined (NULL), singleton -> its
        # item's string form, larger sequences -> JSON text
        return _let(tc.col, lambda c: F.when(
            F.size(c) == 1,
            as_string(_elem_tc(F.element_at(c, 1),
                               tc.elem or "variant", tc.dtype)),
        ).when(
            F.size(c) > 1, F.to_json(c, {"ignoreNullFields": "true"})))
    if tc.kind in ("object", "omap") or tc.kind.startswith("array"):
        return F.to_json(tc.col, {"ignoreNullFields": "true"})
    if tc.kind == "null":
        # undefined, not the string "null": concat treats it as '', and
        # to_json_string drops it — matching the variant path and the
        # interpreter's undefined-dropping
        return F.lit(None).cast("string")
    raise NotCompilable(f"cannot stringify kind {tc.kind}")


_ARRAY_TRUTHY_UNROLL = 3


def _elem_truthy(x: Column, kind: str) -> Column:
    """Truthiness of an array ELEMENT of a statically-known kind, null-safe
    (a NULL element is JSONata undefined -> falsy, so exists() never returns
    NULL overall)."""
    if kind == "number":
        return F.coalesce(x != 0, F.lit(False))
    if kind == "string":
        return F.coalesce(F.length(x) > 0, F.lit(False))
    if kind == "boolean":
        return F.coalesce(x, F.lit(False))
    if kind == "null":
        return F.lit(False)
    if kind == "object":
        # an object is falsy when EMPTY, not just when NULL. For a typed
        # struct element "empty" = every field null — from_json CANNOT
        # distinguish a present-null field ({"a": null}) from a missing one
        # ({}), so the typed path treats {"a": null} as falsy while the
        # interpreter/variant paths (which keep the key) treat it as truthy.
        # KNOWN TYPED-PATH DIVERGENCE, pinned by
        # tests/test_jsonata_compiler.py::test_explicit_null_field_truthiness.
        # ignoreNullFields is passed explicitly so a user session that sets
        # spark.sql.jsonGenerator.ignoreNullFields=false can't flip this.
        return F.coalesce(
            F.to_json(x, {"ignoreNullFields": "true"}) != "{}", F.lit(False)
        )
    if kind.startswith("array<") and kind.endswith(">"):
        inner = kind[6:-1]
        return F.coalesce(
            F.exists(x, lambda y: _elem_truthy(y, inner)), F.lit(False)
        )
    if kind == "variant" or kind.startswith("array"):
        return _variant_truthy(x)
    raise NotCompilable(f"element truthiness of kind {kind} not known")


def _variant_truthy(v: Column, depth: int = _ARRAY_TRUTHY_UNROLL) -> Column:
    """JSONata truthiness of a variant value; type dispatched per row via
    schema_of_variant (a plain expression — stays JVM-side). Nested-array
    any-member recursion is unrolled ``depth`` levels; arrays nested deeper
    than that fall back to non-empty (documented divergence)."""
    vtype = F.schema_of_variant(v)
    arr = F.variant_get(v, "$", "array<variant>")
    if depth <= 0:
        arr_case = F.size(arr) > 0
    else:
        arr_case = F.coalesce(
            F.exists(arr, lambda x: _variant_truthy(x, depth - 1)),
            F.lit(False),
        )
    return (
        F.when(v.isNull() | F.is_variant_null(v), F.lit(False))
        .when(vtype == "BOOLEAN", F.variant_get(v, "$", "boolean"))
        .when(vtype == "STRING",
              F.length(F.variant_get(v, "$", "string")) > 0)
        .when(vtype.startswith("ARRAY"), arr_case)
        .when(vtype.startswith("OBJECT") | vtype.startswith("STRUCT"),
              v.cast("string") != "{}")
        .otherwise(F.coalesce(
            F.try_variant_get(v, "$", "double") != 0, F.lit(False)))
    )


def as_boolean(tc: TypedCol) -> Column:
    """JSONata truthiness (jsonata 1.6 ``values.boolean``): arrays are truthy
    iff ANY member is truthy — [0], [""], [false] are all falsy. For variant
    inputs the type is dispatched per row via schema_of_variant."""
    if tc.kind == "boolean":
        return tc.col
    if tc.kind == "number":
        return tc.col != 0
    if tc.kind == "string":
        return F.length(tc.col) > 0
    if tc.kind.startswith("array"):
        return F.coalesce(
            F.exists(tc.col, lambda x: _elem_truthy(x, tc.elem or "variant")),
            F.lit(False),
        )
    if tc.kind == "null":
        return F.lit(False)
    if tc.kind == "object":
        # same empty-object-falsy rule as _elem_truthy: a NULL or all-null
        # typed struct is JSONata-falsy at top level too (consistent with
        # the array-element path; previously lit(True) unconditionally).
        return F.coalesce(
            F.to_json(tc.col, {"ignoreNullFields": "true"}) != "{}",
            F.lit(False),
        )
    if tc.kind == "variant":
        # _let-bound: _variant_truthy references its input ~6 times.
        # (1-arg wrapper: _variant_truthy's depth default would change
        # the lambda arity under F.transform)
        return _let(tc.col, lambda v: _variant_truthy(v))
    raise NotCompilable(f"truthiness of kind {tc.kind} not statically known")


def _as_array(tc: TypedCol, elem_type: str) -> Column:
    if tc.kind == "variant":
        # a non-array value is a singleton sequence (JSONata wraps
        # scalars for array-consuming contexts: $sum(5) = 5); absent /
        # JSON-null values stay undefined. _let-bound: referenced 4x.
        def wrap(v: Column) -> Column:
            arr = F.try_variant_get(v, "$", f"array<{elem_type}>")
            one = F.when(
                v.isNotNull() & ~F.is_variant_null(v),
                F.array(F.try_variant_get(v, "$", elem_type)),
            )
            return F.coalesce(arr, one)

        return _let(tc.col, wrap)
    if tc.kind.startswith("array"):
        if (tc.elem or "variant") == "variant" and elem_type != "variant":
            return F.transform(
                tc.col, lambda x: F.try_variant_get(x, "$", elem_type)
            )
        return tc.col
    raise NotCompilable(f"cannot use kind {tc.kind} as array")


# --- JSONata sequence semantics over dynamic (variant) values ----------------
#
# JSONata name steps MAP over array values: `items.q` is a sequence of
# every item's q, array-valued members spliced in (one level), missing
# members dropped, explicit JSON nulls kept; an empty sequence is
# undefined, a singleton is its item (jsonata 1.6 evaluateName/lookup
# semantics — the reference reaches them via bin/mqtt-streamr.js:158).
# A plain `try_variant_get(root, '$.items.q')` can't express that (it
# navigates OBJECTS only and yields NULL when an array is crossed), so
# compiled variant paths take `fast-path WHEN NOT NULL, ELSE dynamic
# sequence walk`: object-shaped data pays one variant_get; data with
# arrays mid-path gets the full mapping semantics. Nested-array splicing
# beyond one level per step is the same bounded-unroll divergence class
# as _ARRAY_TRUTHY_UNROLL (documented).

def _let(col: Column, fn) -> Column:
    """Single-binding let: evaluate ``col`` once and reference it many
    times as a lambda variable — ``element_at(transform(array(col),
    v -> fn(v)), 1)``. Emissions that reference an argument k times
    would otherwise COPY its whole subtree k times; nested (e.g.
    ``$append(a, $append(b, c))``) that compounds exponentially — a
    fuzzer-found 3-level compose built a 3.7 MB expression string and
    OOMed the driver during analysis. With _let the tree stays linear.
    The inner lambda is pinned to 1-arg so callables with optional extra
    parameters don't trip F.transform's arity-based index binding."""
    return F.element_at(F.transform(F.array(col), lambda v: fn(v)), 1)


def _group_steps(steps: list) -> list[tuple[str | None, list[int]]]:
    """Group a flat step list into (name, trailing-int-indexes) composite
    steps — JSONata binds `a.b[0]` per-ITEM (the index applies to each
    b value), so ints attach to the preceding name step. Leading ints
    (no preceding name) index the root sequence itself."""
    groups: list[tuple[str | None, list[int]]] = []
    for s in steps:
        if isinstance(s, int):
            if groups:
                groups[-1][1].append(s)
            else:
                groups.append((None, [s]))
        else:
            groups.append((s, []))
    return groups


def _variant_index_value(v: Column, i: int) -> Column:
    """JSONata index into ONE dynamic value: arrays select (negative from
    the end, out-of-range -> undefined); a non-array is a singleton
    sequence, so [0] and [-1] yield the value itself."""
    arr = F.try_variant_get(v, "$", "array<variant>")
    n = F.size(arr)
    w = F.lit(i) + (F.when(F.lit(i) < 0, n).otherwise(F.lit(0)))
    got = F.when((w >= 0) & (w < n),
                 F.try_element_at(arr, (w + 1).cast("int")))
    out = F.when(arr.isNotNull(), got)
    return out.otherwise(v) if i in (0, -1) else out


def _vseq_item_step(v: Column, name: str | None,
                    ints: list[int]) -> Column:
    """One composite path step applied to ONE value; returns the
    array<variant> of results. Treating a non-array value as the
    singleton [v] makes the object and array cases ONE code path —
    expression size matters: analysis/codegen time is the first-run
    cost of every compiled transform."""
    if name is not None:
        members = F.coalesce(
            F.try_variant_get(v, "$", "array<variant>"), F.array(v))
        picked = F.filter(
            F.transform(members, lambda x: F.try_variant_get(
                x, _json_path([name]), "variant")),
            lambda r: r.isNotNull(),
        )
    else:
        picked = F.array(v)

    def _index_step(j: int):
        # NOTE: a plain `lambda r, _j=j: ...` would be 2-arity and
        # F.transform would bind the array INDEX column to _j
        return lambda r: _variant_index_value(r, j)

    for i in ints:
        picked = F.filter(
            F.transform(picked, _index_step(i)),
            lambda r: r.isNotNull(),
        )
    # splice array-valued results into the sequence (one level;
    # explicit JSON nulls kept — they are values, not undefined)
    return F.flatten(F.transform(
        picked,
        lambda r: F.coalesce(
            F.try_variant_get(r, "$", "array<variant>"), F.array(r)),
    ))


def _variant_path_dynamic(root: Column, steps: list) -> Column:
    """Full dynamic walk: fold composite steps over the singleton sequence
    [root], then apply sequence rules (empty -> NULL, singleton -> item,
    else re-encode the sequence as ONE variant array). The first step
    applies to the root value directly (no wrapper sequence)."""
    def _step_fn(n: str | None, i: list[int]):
        # closure factory — default-arg capture would change the lambda's
        # arity and make F.transform bind the array index column to it
        return lambda v: _vseq_item_step(v, n, i)

    seq: Column | None = None
    for name, ints in _group_steps(steps):
        if seq is None:
            seq = _vseq_item_step(root, name, ints)
        else:
            seq = F.flatten(F.transform(seq, _step_fn(name, ints)))
    if seq is None:
        seq = F.array(root)
    n = F.size(seq)
    return (
        F.when(n == 1, F.element_at(seq, 1))
        .when(n > 1, F.parse_json(F.to_json(seq)))
    )


def _variant_nav(root: Column, steps: list,
                 seq_leaf: bool = True) -> Column:
    """Variant path navigation: single-get fast path for object-shaped
    data, dynamic sequence walk when it misses (array mid-path, index
    on a scalar, or a genuinely absent path — the walk re-derives NULL
    for the last case). coalesce short-circuits, so object-shaped rows
    never execute the walk.

    An ARRAY leaf reached through a PATH still obeys JSONata sequence
    rules (the dynamic walk's splice + boundary): ``a.b`` over
    ``{"a":{"b":[5]}}`` is ``5`` (singleton unwrap), over
    ``{"a":{"b":[]}}`` is undefined — so the fast-path result is
    normalized with the same one-level-splice boundary before it wins
    the coalesce (r7 fix; an empty-array leaf nulls out here and the
    walk re-derives undefined). INT-final steps get the same boundary:
    the interpreter's seq_append flattens an index-selected array into
    the result sequence too (``[[0],[2]]`` indexed ``[0]`` is ``0``).
    Flattening beyond one level per step remains the documented bounded
    divergence shared with the dynamic walk.

    ``seq_leaf=False`` (a BARE name lookup, not a path) keeps the raw
    value on the object-root fast path: ``zeros`` over
    ``{"zeros":[0]}`` is ``[0]`` — only paths build sequences
    (interpreter: _eval_name returns the raw value, _eval_path/
    seq_append flatten). An ARRAY root still takes the dynamic walk
    (a name lookup maps over its items and the sequence boundary
    applies, interpreter _lookup_name)."""
    if any(isinstance(s, int) and s < 0 for s in steps):
        # JSON paths can't express count-from-the-end: walk only
        return _variant_path_dynamic(root, steps)
    fast = F.try_variant_get(root, _json_path(steps), "variant")
    if seq_leaf:
        def norm(v: Column) -> Column:
            arr = F.try_variant_get(v, "$", "array<variant>")
            return (
                F.when(arr.isNull(), v)
                .when(F.size(arr) == 1, F.element_at(arr, 1))
                .when(F.size(arr) > 1, v)
            )

        fast = _let(fast, norm)
    return F.coalesce(fast, _variant_path_dynamic(root, steps))


def _seq_boundary(tc: TypedCol) -> TypedCol:
    """Apply JSONata sequence rules at the RESULT boundary of the public
    compile entry points: empty sequence -> undefined (NULL), singleton
    -> its item, larger sequences stay arrays (re-encoded as variant so
    one static Column type covers all three). Internal consumers use
    _compile directly and keep the array form."""
    if not tc.is_seq or not tc.kind.startswith("array"):
        return tc

    def norm(c: Column) -> Column:
        n = F.size(c)
        if (tc.elem or "variant") == "variant":
            one = F.element_at(c, 1)
            many = F.parse_json(F.to_json(c))
        else:
            one = F.parse_json(to_json_string(
                _elem_tc(F.element_at(c, 1), tc.elem, tc.dtype)))
            many = F.parse_json(F.to_json(c, {"ignoreNullFields": "true"}))
        return F.when(n == 1, one).when(n > 1, many)

    return TypedCol(_let(tc.col, norm), "variant")


def _seq_scalar(tc: TypedCol) -> TypedCol:
    """A sequence used where a scalar is expected (comparison operand):
    singleton -> its item; larger sequences -> NULL (JSONata raises a
    type error there — the documented error->null divergence class)."""
    one = _let(tc.col,
               lambda c: F.when(F.size(c) == 1, F.element_at(c, 1)))
    return _elem_tc(one, tc.elem or "variant", tc.dtype)


# --- compiler core -----------------------------------------------------------

def _compile(node, ctx: Ctx) -> TypedCol:
    t = node["type"]
    fn = _NODES.get(t)
    if fn is None:
        raise NotCompilable(f"node type {t!r} not compilable")
    return fn(node, ctx)


def _c_number(node, ctx):
    return TypedCol(F.lit(float(node["value"])), "number")


def _c_string(node, ctx):
    return TypedCol(F.lit(node["value"]), "string")


def _c_boolean(node, ctx):
    return TypedCol(F.lit(node["value"]), "boolean")


def _c_null(node, ctx):
    return TypedCol(F.lit(None), "null")


def _reads_context(node) -> bool:
    """True if the AST reads the evaluation context: a relative name /
    wildcard / descendant step, or `$` / `$$` (`$$` conservatively — the
    compiler resolves it to the local root). Bound `$var` references and
    literals are context-free. Used to detect index predicates whose
    value is the same for every item."""
    if isinstance(node, dict):
        t = node.get("type")
        if t in ("name", "wildcard", "descendants"):
            return True
        if t == "variable" and node.get("value") in ("", "$"):
            return True
        return any(_reads_context(v) for v in node.values())
    if isinstance(node, list):
        return any(_reads_context(v) for v in node)
    return False


def _path_steps(node) -> list | None:
    """Flatten a path AST into [name|index, ...] if it is a pure object/index
    navigation; else None."""
    t = node["type"]
    if t == "name":
        return [node["value"]]
    if t == "predicate":
        base = _path_steps(node["expr"])
        if base is None:
            return None
        cond = node["cond"]
        if cond["type"] == "number" and float(cond["value"]).is_integer() \
                and cond["value"] >= 0:
            return base + [int(cond["value"])]
        if cond["type"] == "unary-" and cond["expr"]["type"] == "number" \
                and float(cond["expr"]["value"]).is_integer():
            # negative literal index (r7): the dynamic walk and the typed
            # element_at both count from the end; the variant FAST get
            # can't (JSON paths have no negative indexes), so _variant_nav
            # skips it for these steps
            return base + [-int(cond["expr"]["value"])]
        return None
    if t == "path":
        lhs = _path_steps(node["lhs"])
        rhs = _path_steps(node["rhs"])
        if lhs is None or rhs is None:
            return None
        return lhs + rhs
    if t == "variable" and node["value"] == "":
        return []  # bare $
    return None


def _json_path(steps: list) -> str:
    out = ["$"]
    for s in steps:
        if isinstance(s, int):
            out.append(f"[{s}]")
        elif _SIMPLE_NAME.match(s):
            out.append(f".{s}")
        else:
            raise NotCompilable(f"field name {s!r} not JSON-path-safe")
    return "".join(out)


def _raw_json_str(arg_node, ctx: Ctx, variant_col: Column | None = None,
                  allow: tuple = ("OBJECT",)) -> Column:
    """Raw JSON TEXT of the value at a literal path from the message root,
    in ORIGINAL key order. The variant binary sorts object keys, so the
    ordered-object functions re-read their argument from the raw payload
    string (``get_json_object`` preserves source order). Compilable only
    when the raw column is available, the context root IS the message
    root, and the argument is a pure name/index path.

    ``variant_col`` guards against the STRING-scalar trap: a string field
    whose CONTENT is JSON text (an embedded serialized payload) looks
    identical in the raw stream — ``get_json_object`` strips the quotes —
    so without a runtime type check $keys on it would read the embedded
    keys. The guard nulls the text unless ``schema_of_variant`` of the
    parsed value at the same path starts with one of ``allow``."""
    if ctx.raw is None or ctx.root_kind != "variant":
        raise NotCompilable(
            "ordered-object op needs the raw JSON column (variant root)"
        )
    steps = _path_steps(arg_node)
    if steps is None:
        raise NotCompilable("ordered-object op needs a literal path arg")
    raw = ctx.raw if not steps else F.get_json_object(
        ctx.raw, _json_path(steps))
    if variant_col is not None:
        t = F.schema_of_variant(variant_col)
        cond = t.startswith(allow[0])
        for a in allow[1:]:
            cond = cond | t.startswith(a)
        raw = F.when(cond, raw)
    return raw


def _ordered_map(arg_node, ctx: Ctx,
                 variant_col: Column | None = None) -> Column:
    """The argument object as ``map<string, variant>`` with keys in source
    order (Spark maps preserve parse order; only the variant binary
    sorts). NULL for non-object values (type-guarded when ``variant_col``
    is given) — undefined downstream."""
    return F.from_json(
        _raw_json_str(arg_node, ctx, variant_col), "map<string, variant>"
    )


def _c_name(node, ctx):
    if ctx.root_kind.startswith("array<") and ctx.root_schema is not None:
        # typed ARRAY context (the group-by value position): a name step
        # maps over the members and drops undefined, per JSONata sequence
        # semantics. ctx.root_schema holds the ELEMENT DataType here.
        import pyspark.sql.types as T

        if not isinstance(ctx.root_schema, T.StructType):
            raise NotCompilable("name step over non-struct array context")
        out = _typed_navigate(F.lit(None), ctx.root_schema, [node["value"]])
        if out.kind == "null":
            return TypedCol(F.lit(None), "null")
        mapped = F.transform(
            ctx.root,
            lambda x: _typed_navigate(x, ctx.root_schema, [node["value"]]).col,
        )
        kept = F.filter(mapped, lambda v: v.isNotNull())
        return TypedCol(kept, f"array<{out.kind}>", elem=out.kind,
                        dtype=out.dtype, is_seq=True)
    if ctx.root_kind == "array<variant>":
        # variant ARRAY context (group-by value position, variant path):
        # name step maps over members and drops undefined
        path = _json_path([node["value"]])
        mapped = F.transform(
            ctx.root, lambda x: F.try_variant_get(x, path, "variant")
        )
        kept = F.filter(
            mapped, lambda v: v.isNotNull() & ~F.is_variant_null(v)
        )
        return TypedCol(kept, "array<variant>", elem="variant", is_seq=True)
    if ctx.root_schema is not None:
        return _typed_navigate(ctx.root, ctx.root_schema, [node["value"]])
    # bare name: raw value semantics (seq_leaf=False) — `zeros` over
    # {"zeros":[0]} is [0], unlike the PATH `$.zeros` which is 0
    if ctx.object_root:
        # declared object root: the single get IS the lookup (no
        # array-root mapping branch — see compile_column docstring)
        return TypedCol(
            F.try_variant_get(ctx.root, _json_path([node["value"]]),
                              "variant"),
            "variant")
    return TypedCol(
        _variant_nav(ctx.root, [node["value"]], seq_leaf=False), "variant")


def _typed_leaf_seq(tc: TypedCol) -> TypedCol:
    """A typed ARRAY leaf reached through a PATH is a JSONata SEQUENCE:
    mark is_seq so the result boundary applies singleton/empty rules
    (interpreter seq_append parity, r7 — mirrors the variant fast-path
    norm)."""
    if tc.kind.startswith("array") and not tc.is_seq \
            and not tc.seq_nav_unsafe:
        return TypedCol(tc.col, tc.kind, elem=tc.elem, dtype=tc.dtype,
                        is_seq=True)
    return tc


def _c_path(node, ctx):
    steps = _path_steps(node)
    if steps is not None:
        if ctx.root_schema is not None:
            return _typed_leaf_seq(
                _typed_navigate(ctx.root, ctx.root_schema, steps))
        return TypedCol(_variant_nav(ctx.root, steps), "variant")
    if node["rhs"]["type"] == "descendants":
        # `a.**` / `a.b.**`: bare descendants under a literal prefix (r7)
        return _c_desc_all(_path_steps(node["lhs"]), ctx)
    rhs_steps = _path_steps(node["rhs"])
    if rhs_steps is None:
        raise NotCompilable("non-trivial path rhs")
    lhs_node = node["lhs"]
    is_desc = lhs_node["type"] == "descendants"
    is_desc_tail = (lhs_node["type"] == "path"
                    and lhs_node["rhs"]["type"] == "descendants")
    if is_desc or is_desc_tail:
        # `**.k` / `a.b.**.k` on the TYPED path: the schema statically
        # bounds the hierarchy, so descendant traversal expands to a finite
        # concat of struct navigations + array flattens (document order,
        # jsonata.js fn.descendants semantics: arrays are flattened into
        # the sequence, objects recursed). Variant inputs (r6) take the
        # depth-bounded raw-text recursion in _c_desc_variant instead.
        base = (TypedCol(ctx.root, ctx.root_kind, dtype=ctx.root_schema)
                if is_desc else _compile(lhs_node["lhs"], ctx))
        import pyspark.sql.types as T

        if base.kind == "object" and isinstance(base.dtype, T.StructType):
            seg = _desc_matches(base.col, base.dtype, rhs_steps)
            if seg is None:
                return TypedCol(F.lit(None), "null")
            merged, kind = seg
            kept = F.filter(merged, lambda v: v.isNotNull())
            return TypedCol(kept, f"array<{kind}>", elem=kind, is_seq=True)
        return _c_desc_variant(lhs_node, is_desc, rhs_steps, ctx)
    lhs = _compile(node["lhs"], ctx)
    if lhs.kind == "object" and lhs.dtype is not None:
        # typed struct navigation (e.g. lambda var $x.f on the typed path)
        return _typed_navigate(lhs.col, lhs.dtype, rhs_steps)
    if lhs.kind.startswith("array") and lhs.elem == "object" \
            and lhs.dtype is not None:
        if lhs.seq_nav_unsafe:
            # e.g. $match(...).match — a 1-match result must collapse to
            # the scalar and 0 matches to undefined (JSONata sequence
            # rules); a Column has one static type, so hand the whole
            # expression to the interpreter rather than silently return
            # [x]/[] where the reference gives x/undefined
            raise NotCompilable(
                "name navigation over $match results needs singleton "
                "collapse (interpreter)"
            )
        # typed array of structs: map the name step over elements
        out = _typed_navigate(
            F.lit(None), lhs.dtype, rhs_steps
        )  # resolve result kind from the ELEMENT schema
        mapped = F.transform(
            lhs.col,
            lambda x: _typed_navigate(x, lhs.dtype, rhs_steps).col,
        )
        kept = F.filter(mapped, lambda v: v.isNotNull())
        return TypedCol(kept, f"array<{out.kind}>", elem=out.kind,
                        dtype=out.dtype, is_seq=True)
    path = _json_path(rhs_steps)
    if lhs.kind == "variant":
        # navigation within a bound variant value (e.g. a lambda var $x.f):
        # full dynamic dispatch — maps over array values per _variant_nav
        return TypedCol(_variant_nav(lhs.col, rhs_steps), "variant")
    if lhs.kind.startswith("array") and (lhs.elem or "variant") == "variant":
        # statically-known array (predicate/HOF result): name step maps over
        # elements and drops undefined, per JSONata sequence semantics
        mapped = F.transform(
            lhs.col, lambda x: F.try_variant_get(x, path, "variant")
        )
        kept = F.filter(
            mapped, lambda v: v.isNotNull() & ~F.is_variant_null(v)
        )
        return TypedCol(kept, "array<variant>", elem="variant", is_seq=True)
    raise NotCompilable(f"path over kind {lhs.kind}")


def _desc_matches(col: Column, dt, steps: list):
    """All matches of ``steps`` under every descendant struct (including the
    value itself) of a statically-typed value, in document order (pre-order:
    self, then fields in declared order). Returns ``(array Column, elem
    kind)`` or None when the schema statically guarantees no match. Arrays
    along the way are flattened (jsonata.js recurseDescendants pushes
    members, not the array)."""
    import pyspark.sql.types as T

    segs: list[tuple[Column, str]] = []
    if isinstance(dt, T.StructType):
        tc = _typed_navigate(col, dt, steps)
        if tc.kind in ("number", "string", "boolean"):
            segs.append((F.array(tc.col), tc.kind))
        elif tc.kind.startswith("array<") and tc.elem in (
            "number", "string", "boolean"
        ):
            # a matched field that is itself an array of scalars flattens
            # into the result sequence
            segs.append((tc.col, tc.elem))
        elif tc.kind not in ("null", "object") and not tc.kind.startswith(
            "array"
        ):
            raise NotCompilable(f"descendant match of kind {tc.kind}")
        for fld in dt.fields:
            sub = _desc_matches(col.getField(fld.name), fld.dataType, steps)
            if sub is not None:
                segs.append(sub)
    elif isinstance(dt, T.ArrayType):
        et = dt.elementType
        if isinstance(et, (T.StructType, T.ArrayType)):
            probe = _desc_matches(F.lit(None), et, steps)
            if probe is not None:
                _, kind = probe
                empty = _empty_arr(kind)
                per_elem = F.flatten(
                    F.transform(
                        col,
                        lambda x: F.coalesce(
                            _desc_matches(x, et, steps)[0], empty
                        ),
                    )
                )
                segs.append((per_elem, kind))
    if not segs:
        return None
    kinds = {k for _, k in segs}
    if len(kinds) != 1:
        raise NotCompilable(
            f"heterogeneous descendant match kinds {sorted(kinds)}"
        )
    kind = kinds.pop()
    # a NULL segment (absent nested struct / null array field) would null
    # the whole concat; coalesce each to a typed empty array
    cols = [F.coalesce(c, _empty_arr(kind)) for c, _ in segs]
    merged = cols[0] if len(cols) == 1 else F.concat(*cols)
    return merged, kind


_KIND_SPARK = {"number": "double", "string": "string", "boolean": "boolean"}


def _empty_arr(kind: str) -> Column:
    return F.array().cast(f"array<{_KIND_SPARK[kind]}>")


# Max JSON nesting depth the compiled variant-path `**` unrolls to. Deeper
# rows fail LOUDLY (assert_true) instead of silently truncating — route
# such payloads to the interpreter backend. 10 levels covers any sane
# message payload; the unrolled expression stays O(depth). The ceiling is
# the ANALYZER, not runtime: each unroll level adds nested lambdas whose
# resolution costs analyzer iterations, and the default
# spark.sql.analyzer.maxIterations=100 resolves ~12 levels — 10 leaves
# margin for wrapping expressions ($sum(**.k), comparisons, constructors).
VARIANT_DESC_DEPTH = 10


def _empty_varr() -> Column:
    return F.from_json(F.lit("[]"), "array<variant>")


# --- one-parse SQL emission for the descendants walks (r12) -----------------
#
# The depth-unrolled ** walks below build ~10 structurally identical levels
# of Column tree; via the PySpark functions API that is thousands of py4j
# driver round-trips (~1.5-3 s of pure construction time per expansion,
# measured — the same driver-constant class as the r12 LSH literal-matrix
# change). The walk is instead emitted as ONE SQL string (Python string
# recursion, microseconds) and parsed once by ``F.expr`` (~10 ms). The text
# reproduces the Catalyst renderer's output for the Column-built tree
# verbatim (modulo lambda-variable names), which
# tests/test_jsonata_compiler.py::test_desc_sql_emitters_match_column_builders
# pins by canonicalized-render equality at depths 1 and 2 — so the analyzed
# expression, the executed plan, and the results are identical by
# construction. The Column builders (``*_cols``) remain both as the
# equivalence reference and as the runtime fallback whenever the inputs
# cannot be spliced safely:
#
# - the ``raw``/``guard`` input Columns are rendered to SQL and must
#   round-trip (render -> parse -> render is a fixed point), else fallback;
# - spliced string literals (the match step, the rest JSON path) must be in
#   a conservative safe charset, else fallback;
# - any parse error falls back.
#
# Lambda-variable names are drawn from a module-global counter with a
# distinctive prefix, so no emission can capture or shadow variables of an
# enclosing PySpark-built lambda (named ``x_N``/``y_N``) or of another
# emission spliced inside it.

_DESC_SAFE_LIT = _re.compile(r"^[A-Za-z0-9_$. \[\]\-]*$")
_DESC_VAR_COUNTER = _itertools.count()


def _desc_fresh_var() -> str:
    return f"jdv{next(_DESC_VAR_COUNTER)}"


def _render_expr_sql(col: Column) -> str:
    """Catalyst SQL rendering of an (unresolved) Column expression."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    jvm = spark._jvm
    conv = getattr(
        getattr(jvm, "org.apache.spark.sql.classic."
                     "ColumnNodeToExpressionConverter$"), "MODULE$")
    return conv.apply(col._jc.node()).sql()


def _splice_sql(col: Column) -> str | None:
    """SQL text of ``col`` safe to splice into an emitted expression:
    render must round-trip through the parser to the identical text (a
    fixed point — guarantees the splice parses back to the same
    expression), and must not collide with the emission namespace."""
    try:
        txt = _render_expr_sql(col)
        if "jdv" in txt:
            return None
        if _render_expr_sql(F.expr(txt)) != txt:
            return None
        return txt
    except Exception:
        return None


def _depth_msg(max_depth: int) -> str:
    return (f"jsonata compiled ** exceeded max nesting depth {max_depth}; "
            f"use the interpreter backend for deeper payloads")


_EMPTY_VARR_SQL = "from_json('[]', 'array<variant>')"


def _sql_desc_all(n: str, nv: str, d: int, max_depth: int) -> str:
    """One level of the bare-** walk (``_desc_all_variant_cols``'s
    ``level``) as SQL text — field-for-field the renderer's output."""
    e, s, v = _desc_fresh_var(), _desc_fresh_var(), _desc_fresh_var()
    p, x = _desc_fresh_var(), _desc_fresh_var()
    ev = _EMPTY_VARR_SQL
    pairs = (
        f"coalesce(transform(map_entries(from_json({n}, "
        f"'map<string, string>')), {e} -> struct({e}['value'] AS s, "
        f"element_at(try_variant_get({nv}, '$', 'map<string, variant>'), "
        f"{e}['key']) AS vv)), "
        f"zip_with(from_json({n}, 'array<string>'), "
        f"try_variant_get({nv}, '$', 'array<variant>'), "
        f"({s}, {v}) -> struct({s} AS s, {v} AS vv)))"
    )
    c_arr = f"isNotNull(try_variant_get({x}['vv'], '$', 'array<variant>'))"
    c_obj = (f"isNotNull(try_variant_get({x}['vv'], '$', "
             f"'map<string, variant>'))")
    self_part = (f"CASE WHEN or({c_arr}, isNull({x}['vv'])) THEN {ev} "
                 f"ELSE array({x}['vv']) END")
    if d == 0:
        deeper = (f"CASE WHEN isNull(assert_true(coalesce(`!`(or({c_arr}, "
                  f"{c_obj})), true), '{_depth_msg(max_depth)}')) "
                  f"THEN {ev} END")
    else:
        rec = _sql_desc_all(f"{x}['s']", f"{x}['vv']", d - 1, max_depth)
        deeper = (f"CASE WHEN or({c_arr}, {c_obj}) THEN {rec} "
                  f"ELSE {ev} END")
    body = (f"flatten(transform({p}, {x} -> "
            f"concat({self_part}, {deeper})))")
    return (f"element_at(transform(array({pairs}), "
            f"{p} -> {body}), 1)")


def _sql_desc_matches(n: str, nv: str, first: str, rest_path: str | None,
                      d: int, max_depth: int) -> str:
    """One level of the ``**.k`` walk (``_desc_matches_variant_cols``'s
    ``level``) as SQL text — field-for-field the renderer's output,
    including the triple rendering of the shared match subtree."""
    e, s, v = _desc_fresh_var(), _desc_fresh_var(), _desc_fresh_var()
    p, f_, k, x = (_desc_fresh_var(), _desc_fresh_var(),
                   _desc_fresh_var(), _desc_fresh_var())
    ev = _EMPTY_VARR_SQL
    pairs = (
        f"coalesce(transform(map_entries(from_json({n}, "
        f"'map<string, string>')), {e} -> struct({e}['key'] AS key, "
        f"{e}['value'] AS s, "
        f"element_at(try_variant_get({nv}, '$', 'map<string, variant>'), "
        f"{e}['key']) AS vv)), "
        f"zip_with(from_json({n}, 'array<string>'), "
        f"try_variant_get({nv}, '$', 'array<variant>'), "
        f"({s}, {v}) -> struct(CAST(NULL AS STRING) AS key, {s} AS s, "
        f"{v} AS vv)))"
    )
    pieces = (f"struct({pairs} AS pairs, isNotNull(from_json({n}, "
              f"'map<string, string>')) AS is_obj)")
    m0 = (f"CASE WHEN {p}['is_obj'] THEN get(filter({p}['pairs'], "
          f"{f_} -> `=`({f_}['key'], '{first}')), 0)['vv'] "
          f"END")
    m = (f"try_variant_get({m0}, '{rest_path}', 'variant')"
         if rest_path else m0)
    m_arr = (f"CASE WHEN or(isNull({m}), is_variant_null({m})) THEN {ev} "
             f"ELSE array({m}) END")
    kids = (f"filter({p}['pairs'], {k} -> or(isNotNull("
            f"try_variant_get({k}['vv'], '$', 'array<variant>')), "
            f"isNotNull(try_variant_get({k}['vv'], '$', "
            f"'map<string, variant>'))))")
    if d == 0:
        deeper = (f"CASE WHEN isNull(assert_true(coalesce("
                  f"`<=`(size({kids}), 0), true), "
                  f"'{_depth_msg(max_depth)}')) THEN {ev} END")
    else:
        rec = _sql_desc_matches(f"{x}['s']", f"{x}['vv']", first, rest_path,
                                d - 1, max_depth)
        deeper = f"flatten(transform({kids}, {x} -> {rec}))"
    body = f"concat({m_arr}, {deeper})"
    return (f"element_at(transform(array({pieces}), "
            f"{p} -> {body}), 1)")


def _c_desc_variant(lhs_node, is_desc: bool, rhs_steps: list,
                    ctx: Ctx) -> TypedCol:
    """`**.k` / `a.b.**.k` on the VARIANT path (r6): no schema bounds the
    hierarchy, so traversal is a depth-bounded (``VARIANT_DESC_DEPTH``)
    pre-order recursion over RAW JSON text — ``from_json`` into
    ``map<string, string>`` / ``array<string>`` yields each child's source
    text in DOCUMENT order (the variant binary sorts object keys, so
    recursing through variant casts would break jsonata.js descendant
    order), while child container-ness is read from the parallel
    ``map<string, variant>`` parse of the SAME node, so a string field
    whose content is JSON text types as STRING and is never recursed into
    (the quote-stripping trap ``_raw_json_str`` guards against). Matches
    follow the compiled name-step conventions: array-valued matches
    flatten into the sequence (interpreter seq_append), JSON-null matches
    drop (the documented null==absent divergence class)."""
    if ctx.raw is None or ctx.root_kind != "variant":
        raise NotCompilable(
            "variant descendants need the raw JSON column "
            "(key/document order is unrecoverable from the variant binary)")
    steps = [] if is_desc else _path_steps(lhs_node["lhs"])
    if steps is None:
        raise NotCompilable("descendants need a literal path prefix")
    if steps:
        raw = F.get_json_object(ctx.raw, _json_path(steps))
        guard = F.try_variant_get(ctx.root, _json_path(steps), "variant")
    else:
        raw, guard = ctx.raw, ctx.root
    raw = F.when(
        F.try_variant_get(guard, "$", "array<variant>").isNotNull()
        | F.try_variant_get(guard, "$", "map<string, variant>").isNotNull(),
        raw,
    )
    arr = _desc_matches_variant(raw, guard, rhs_steps)
    return TypedCol(arr, "array<variant>", elem="variant", is_seq=True)


def _desc_matches_variant(raw: Column, root_variant: Column, steps: list,
                          depth: int = VARIANT_DESC_DEPTH) -> Column:
    """All ``steps`` matches under every descendant — front door. Emits
    the walk as one parsed SQL string when the inputs splice safely
    (~10 ms instead of ~1.5-3 s of py4j Column construction, r12 — see
    the emission section above ``_sql_desc_all``), else falls back to the
    reference Column builder. Both produce the identical expression
    (pinned by canonicalized-render equality in tests)."""
    first = steps[0] if steps else None
    if not isinstance(first, str):
        raise NotCompilable("descendant match must start with a name step")
    rest = steps[1:]
    rest_path = _json_path(rest) if rest else None
    if (_DESC_SAFE_LIT.match(first)
            and (rest_path is None or _DESC_SAFE_LIT.match(rest_path))):
        n_sql = _splice_sql(raw)
        nv_sql = _splice_sql(root_variant)
        if n_sql is not None and nv_sql is not None:
            try:
                walk = F.expr(_sql_desc_matches(
                    n_sql, nv_sql, first, rest_path, depth, depth))
                return _flatten_variant_seq(walk)
            except Exception:
                pass
    return _desc_matches_variant_cols(raw, root_variant, steps, depth)


def _desc_matches_variant_cols(raw: Column, root_variant: Column,
                               steps: list,
                               depth: int = VARIANT_DESC_DEPTH) -> Column:
    """All ``steps`` matches under every descendant of the container whose
    raw JSON text is ``raw`` (which must be type-guarded by the caller;
    ``root_variant`` is the same value already parsed — never re-parsed
    here), as ``array<variant>`` in pre-order document order. One recursion level
    per unroll step; each level binds its node's parsed (text, variant)
    child pairs ONCE via a 1-element transform (interpreted variant
    expressions get no common-subexpression elimination, and naive
    inlining would blow up 2^depth).

    Cost discipline (measured at sf0.1, 100k rows, 3 container nodes/row):
    each node pays ONE text parse (from_json; the mismatched-shape parse
    fails on the first character) and its variant is SLICED from the
    parent (element_at / the container casts) — never re-parsed
    (parse_json) and never schema-stringified (schema_of_variant), both
    of which profiling showed add ~15% each. The floor, ~50us/row, is
    Catalyst's interpreted-mode HOF dispatch itself: variant expressions
    run outside whole-stage codegen, so this path is ~2x SLOWER per-op
    than the Arrow-batched interpreter UDF (~33us/row) on shallow
    payloads. It still wins where it matters at scale: no Python worker
    fleet (memory + startup per executor), no Arrow boundary for the
    payload column, and it composes into one Column with the rest of a
    compiled expression. For hot schemaless paths the real answer is the
    TYPED backend (declare or infer_message_schema a schema): ~19us/row
    measured on the same transform — the residual cost is the payload
    from_json itself; the traversal is codegen'd."""
    first, rest = steps[0], steps[1:]
    if not isinstance(first, str):
        raise NotCompilable("descendant match must start with a name step")
    rest_path = _json_path(rest) if rest else None

    def level(n: Column, nv: Column, d: int) -> Column:
        # n: raw JSON text of a container node (key/element order);
        # nv: the SAME node as a variant, SLICED from the parent's variant
        # (child types + match values). The text is parsed once per node
        # (from_json map<string,string>; the mismatched-shape parse below
        # fails on the first character) and the variant is never re-parsed
        # — children are offset-slices of the parent binary (element_at /
        # the map cast), which profiling showed is the difference between
        # beating the Arrow interpreter and losing to it: the first cut
        # re-built every node's variant from text (parse_json) and asked
        # schema_of_variant for an O(subtree) schema string per child.
        sm = F.from_json(n, "map<string, string>")
        pairs_obj = F.transform(
            F.map_entries(sm),
            lambda e: F.struct(
                e["key"].alias("key"), e["value"].alias("s"),
                F.element_at(
                    F.try_variant_get(nv, "$", "map<string, variant>"),
                    e["key"],
                ).alias("vv"),
            ),
        )
        pairs_arr = F.zip_with(
            F.from_json(n, "array<string>"),
            F.try_variant_get(nv, "$", "array<variant>"),
            lambda s, vv: F.struct(
                F.lit(None).cast("string").alias("key"), s.alias("s"),
                vv.alias("vv"),
            ),
        )
        pieces = F.struct(
            F.coalesce(pairs_obj, pairs_arr).alias("pairs"),
            sm.isNotNull().alias("is_obj"),
        )

        def body(p):
            m0 = F.when(
                p["is_obj"],
                F.get(F.filter(
                    p["pairs"], lambda x: x["key"] == F.lit(first)
                ), 0)["vv"],
            )
            m = (F.try_variant_get(m0, rest_path, "variant")
                 if rest_path else m0)
            # matches are emitted UNFLATTENED here; _flatten_variant_seq
            # applies the jsonata.js data-array flattening once, outside
            # the recursion (per-level flattening would burn analyzer
            # iteration budget that is better spent on nesting depth)
            m_arr = F.when(
                m.isNull() | F.is_variant_null(m), _empty_varr()
            ).otherwise(F.array(m))
            # NULL pairs (scalar/invalid node) propagate through to a NULL
            # result = JSONata undefined, distinct from "no matches" []
            kids = F.filter(
                p["pairs"],
                lambda x: F.try_variant_get(
                    x["vv"], "$", "array<variant>"
                ).isNotNull()
                | F.try_variant_get(
                    x["vv"], "$", "map<string, variant>"
                ).isNotNull(),
            )
            if d == 0:
                deeper = F.when(
                    F.assert_true(
                        F.coalesce(F.size(kids) <= 0, F.lit(True)),
                        f"jsonata compiled ** exceeded max nesting depth "
                        f"{depth}; use the interpreter backend for deeper "
                        f"payloads",
                    ).isNull(),
                    _empty_varr(),
                )
            else:
                deeper = F.flatten(
                    F.transform(
                        kids, lambda x: level(x["s"], x["vv"], d - 1)
                    )
                )
            return F.concat(m_arr, deeper)

        return F.element_at(F.transform(F.array(pieces), body), 1)

    return _flatten_variant_seq(level(raw, root_variant, depth))


def _c_desc_all(steps: list | None, ctx: Ctx) -> TypedCol:
    """Bare ``**`` (no trailing name step) on the VARIANT path (r7):
    every descendant VALUE in pre-order document order — jsonata.js
    fn.recurseDescendants: arrays are never emitted themselves (their
    elements are walked in place), objects and scalars are, objects
    recursed; the base value itself leads the sequence unless it is an
    array. Same depth-bounded raw-text recursion as ``**.k``
    (_desc_matches_variant), but JSON-null children are KEPT — they are
    descendant values (interpreter _descend), not match misses."""
    if ctx.raw is None or ctx.root_kind != "variant":
        raise NotCompilable(
            "variant descendants need the raw JSON column "
            "(key/document order is unrecoverable from the variant binary)")
    if steps is None:
        raise NotCompilable("descendants need a literal path prefix")
    if steps:
        raw = F.get_json_object(ctx.raw, _json_path(steps))
        guard = F.try_variant_get(ctx.root, _json_path(steps), "variant")
    else:
        raw, guard = ctx.raw, ctx.root
    is_obj = F.try_variant_get(guard, "$", "map<string, variant>").isNotNull()
    is_arr = F.try_variant_get(guard, "$", "array<variant>").isNotNull()
    walked = F.coalesce(
        _desc_all_variant(F.when(is_obj | is_arr, raw), guard),
        _empty_varr(),
    )
    self_part = F.when(is_arr, _empty_varr()).otherwise(F.array(guard))
    out = F.when(
        guard.isNotNull() & ~F.is_variant_null(guard),
        F.concat(self_part, walked),
    )
    return TypedCol(out, "array<variant>", elem="variant", is_seq=True)


def _desc_all_variant(raw: Column, root_variant: Column,
                      depth: int = VARIANT_DESC_DEPTH) -> Column:
    """All descendant values below the container — front door. One-parse
    SQL emission when the inputs splice safely (r12, see the emission
    section above ``_sql_desc_all``), Column-builder fallback otherwise;
    identical expression either way (render-parity pinned in tests)."""
    n_sql = _splice_sql(raw)
    nv_sql = _splice_sql(root_variant)
    if n_sql is not None and nv_sql is not None:
        try:
            return F.expr(_sql_desc_all(n_sql, nv_sql, depth, depth))
        except Exception:
            pass
    return _desc_all_variant_cols(raw, root_variant, depth)


def _desc_all_variant_cols(raw: Column, root_variant: Column,
                           depth: int = VARIANT_DESC_DEPTH) -> Column:
    """All descendant values BELOW the container whose raw JSON text is
    ``raw`` (caller type-guards it), pre-order document order, as
    ``array<variant>``. Same cost discipline as _desc_matches_variant:
    one text parse per node, children's variants sliced from the parent,
    loud assert_true past the unroll depth."""

    def level(n: Column, nv: Column, d: int) -> Column:
        sm = F.from_json(n, "map<string, string>")
        pairs_obj = F.transform(
            F.map_entries(sm),
            lambda e: F.struct(
                e["value"].alias("s"),
                F.element_at(
                    F.try_variant_get(nv, "$", "map<string, variant>"),
                    e["key"],
                ).alias("vv"),
            ),
        )
        pairs_arr = F.zip_with(
            F.from_json(n, "array<string>"),
            F.try_variant_get(nv, "$", "array<variant>"),
            lambda s, vv: F.struct(s.alias("s"), vv.alias("vv")),
        )
        pairs = F.coalesce(pairs_obj, pairs_arr)

        def body(p):
            def contrib(x):
                c_arr = F.try_variant_get(
                    x["vv"], "$", "array<variant>").isNotNull()
                c_obj = F.try_variant_get(
                    x["vv"], "$", "map<string, variant>").isNotNull()
                # JSON-null children are VALUES here (interpreter _descend
                # appends them), unlike **.k match misses which drop
                self_part = F.when(
                    c_arr | x["vv"].isNull(), _empty_varr()
                ).otherwise(F.array(x["vv"]))
                if d == 0:
                    deeper = F.when(
                        F.assert_true(
                            F.coalesce(~(c_arr | c_obj), F.lit(True)),
                            f"jsonata compiled ** exceeded max nesting "
                            f"depth {depth}; use the interpreter backend "
                            f"for deeper payloads",
                        ).isNull(),
                        _empty_varr(),
                    )
                else:
                    deeper = F.when(
                        c_arr | c_obj, level(x["s"], x["vv"], d - 1)
                    ).otherwise(_empty_varr())
                return F.concat(self_part, deeper)

            return F.flatten(F.transform(p, contrib))

        return F.element_at(F.transform(F.array(pairs), body), 1)

    return level(raw, root_variant, depth)


def _c_descendants(node, ctx):
    """Top-level bare ``**`` over the message root."""
    return _c_desc_all([], ctx)


# Data arrays in a JSONata path sequence flatten RECURSIVELY (seq_append:
# `[[1,2],3]` contributes 1,2,3). The compiled post-pass unrolls that
# recursion _SEQ_FLATTEN_UNROLL levels — arrays nested deeper inside a
# matched value stay nested, the same bounded-unroll divergence class as
# _ARRAY_TRUTHY_UNROLL (asserted in tests).
_SEQ_FLATTEN_UNROLL = 4


def _flatten_variant_seq(arr: Column) -> Column:
    """Flatten array-valued members of an ``array<variant>`` sequence into
    their elements (dropping JSON nulls, the null==absent class), one
    level per pass, ``_SEQ_FLATTEN_UNROLL`` passes. Only an array variant
    casts to ``array<variant>`` (non-arrays give NULL), so one cheap cast
    both detects and converts; the filter runs only on real arrays and
    the coalesce keeps non-array members as-is."""
    out = arr
    for _ in range(_SEQ_FLATTEN_UNROLL):
        out = F.flatten(F.transform(
            out,
            lambda e: F.coalesce(
                F.filter(
                    F.try_variant_get(e, "$", "array<variant>"),
                    lambda x: x.isNotNull() & ~F.is_variant_null(x),
                ),
                F.array(e),
            ),
        ))
    return out


def _c_predicate(node, ctx):
    steps = _path_steps(node)
    if steps is not None:
        if ctx.root_schema is not None:
            return _typed_leaf_seq(
                _typed_navigate(ctx.root, ctx.root_schema, steps))
        return TypedCol(_variant_nav(ctx.root, steps), "variant")
    cond = node["cond"]
    base = _compile(node["expr"], ctx)
    if base.kind == "null":  # predicate over undefined -> undefined
        return base
    arr, elem, elem_dt = _hof_array(base)
    if not _reads_context(cond):
        # JSONata evaluates the predicate per item and treats a NUMERIC
        # result as index selection (floor; negative from the end;
        # out-of-range dropped), and an ARRAY-of-numbers result as
        # membership over item positions (each item kept at most once,
        # in item order — `a[[2,0]]` is ['a0','a2']). A context-free
        # cond evaluates identically for every item, so both forms
        # compile to one outer-scope column; context-DEPENDENT conds
        # (and every boolean cond) keep the filter path below.
        try:
            child = ctx.down(root=ctx.root, root_kind=ctx.root_kind,
                             root_schema=ctx.root_schema, raw=ctx.raw)
            ctc = _compile(cond, child)
        except NotCompilable:
            ctc = None
        n = F.size(arr).cast("long")
        if ctc is not None and ctc.kind == "number":
            idx = F.floor(ctc.col).cast("long")

            def index_into(a: Column) -> Column:
                # guarded: ANSI element_at raises on out-of-bounds;
                # JSONata yields undefined. _let-bound (a referenced 4x,
                # and arr can be a full path-walk tree).
                an = F.size(a).cast("long")
                w = F.when(idx < 0, idx + an).otherwise(idx)
                got = F.when((w >= 0) & (w < an),
                             F.try_element_at(a, (w + 1).cast("int")))
                if base.kind == "variant":
                    # non-array base is a singleton sequence: [0]/[-1]
                    # yield the value itself (scalar-as-singleton rule)
                    got = F.when(a.isNotNull(), got).otherwise(
                        F.when(idx.isin(0, -1), base.col))
                return got

            return _elem_tc(_let(arr, index_into), elem, elem_dt)
        if ctc is not None and ctc.kind == "array<number>":
            wanted = F.transform(
                ctc.col,
                lambda i: F.when(F.floor(i) < 0,
                                 F.floor(i).cast("long") + n)
                           .otherwise(F.floor(i).cast("long")),
            )
            return TypedCol(
                F.filter(arr,
                         lambda x, i: F.array_contains(wanted,
                                                       i.cast("long"))),
                f"array<{elem}>", elem=elem, dtype=elem_dt, is_seq=True,
            )
    # filter predicate: evaluate cond with each element as context.
    # NOTE: applies to arrays; JSONata's scalar-as-singleton-sequence rule
    # is not reproducible in a statically-typed column (documented
    # divergence — the interpreter path covers scalars).

    def pred(x: Column) -> Column:
        child = ctx.down(root=x, root_kind=elem, root_schema=elem_dt)
        return as_boolean(_compile(cond, child))

    return TypedCol(F.filter(arr, pred), f"array<{elem}>", elem=elem,
                    dtype=elem_dt, is_seq=True)


def _c_variable(node, ctx):
    name = node["value"]
    if name == "$":
        # `$$` = the ORIGINAL evaluation root, not the local context
        # (r9 fix: inside predicates / mapped steps / group-by values /
        # transform updates the two differ, and the old alias to the
        # local root silently diverged from the interpreter)
        if ctx.root0 is None:  # root IS the original root
            name = ""
        else:
            kind = ctx.root0_kind
            elem = kind[6:-1] if kind.startswith("array<") else None
            return TypedCol(ctx.root0, kind, elem=elem,
                            dtype=ctx.root0_schema)
    if name == "":
        kind = ctx.root_kind
        elem = kind[6:-1] if kind.startswith("array<") else None
        return TypedCol(ctx.root, kind, elem=elem, dtype=ctx.root_schema,
                        is_seq=ctx.root_is_seq and kind.startswith("array"))
    if name in ctx.bindings:
        return ctx.bindings[name]
    raise NotCompilable(f"unbound variable ${name}")


def _c_block(node, ctx):
    child = ctx.down(root=ctx.root, root_kind=ctx.root_kind,
                     root_schema=ctx.root_schema, raw=ctx.raw)
    result: TypedCol | None = None
    for expr in node["expressions"]:
        result = _compile(expr, child)
        # rebind into child env as _c_bind mutates child.bindings
    if result is None:
        return TypedCol(F.lit(None), "null")
    return result


def _c_bind(node, ctx):
    tc = _compile(node["expr"], ctx)
    ctx.bindings[node["var"]] = tc
    return tc


def _c_unary_minus(node, ctx):
    return TypedCol(-as_number(_compile(node["expr"], ctx)), "number")


def _c_condition(node, ctx):
    cond = as_boolean(_compile(node["cond"], ctx))
    then = _compile(node["then"], ctx)
    if node["else"] is None:
        otherwise = TypedCol(F.lit(None), then.kind)
    else:
        otherwise = _compile(node["else"], ctx)
    if (then.is_seq and then.kind.startswith("array")) \
            or (otherwise.is_seq and otherwise.kind.startswith("array")):
        # a SEQUENCE branch must cross the conditional post-boundary
        # (singleton -> item, empty -> undefined) — dropping is_seq here
        # returned raw ['only'] where the interpreter gives 'only' (r7
        # fuzzer find). One static type for "item or array": variant.
        t = F.parse_json(to_json_string(then))
        e = F.parse_json(to_json_string(otherwise))
        return TypedCol(F.when(cond, t).otherwise(e), "variant")
    then_c, else_c, kind = _unify(then, otherwise)
    return TypedCol(F.when(cond, then_c).otherwise(else_c), kind)


def _unify(a: TypedCol, b: TypedCol) -> tuple[Column, Column, str]:
    if a.kind == b.kind:
        return a.col, b.col, a.kind
    if "null" in (a.kind, b.kind):
        kind = a.kind if b.kind == "null" else b.kind
        return (
            a.col if a.kind != "null" else F.lit(None),
            b.col if b.kind != "null" else F.lit(None),
            kind,
        )
    pairs = {frozenset(("number", "variant")): "number",
             frozenset(("string", "variant")): "string",
             frozenset(("boolean", "variant")): "boolean"}
    target = pairs.get(frozenset((a.kind, b.kind)))
    if target == "number":
        return as_number(a), as_number(b), "number"
    if target == "string":
        return as_string(a), as_string(b), "string"
    raise NotCompilable(f"cannot unify kinds {a.kind} and {b.kind}")


def _c_binary(node, ctx):
    op = node["op"]
    if op in ("and", "or"):
        lhs = as_boolean(_compile(node["lhs"], ctx))
        rhs = as_boolean(_compile(node["rhs"], ctx))
        col = (F.coalesce(lhs, F.lit(False)) & F.coalesce(rhs, F.lit(False))
               if op == "and"
               else F.coalesce(lhs, F.lit(False)) | F.coalesce(rhs, F.lit(False)))
        return TypedCol(col, "boolean")
    lhs = _compile(node["lhs"], ctx)
    if op == "in" and node["rhs"]["type"] == "array":
        # literal-array rhs: compile MEMBERS individually so strict
        # equality survives — routing through _c_array would coerce
        # variant members to the unified element kind and let "1"
        # match 1 (r7, ADVICE fix)
        if lhs.is_seq and lhs.kind.startswith("array"):
            lhs = _seq_scalar(lhs)
        col = F.lit(False)
        for it in node["rhs"]["items"]:
            col = col | F.coalesce(
                _member_eq(lhs, _compile(it, ctx),
                           splice=it["type"] == "path"),
                F.lit(False))
        return TypedCol(col, "boolean")
    rhs = _compile(node["rhs"], ctx)
    if op == "&":
        return TypedCol(
            F.concat(
                F.coalesce(as_string(lhs), F.lit("")),
                F.coalesce(as_string(rhs), F.lit("")),
            ),
            "string",
        )
    if op in ("+", "-", "*", "/", "%"):
        a, b = as_number(lhs), as_number(rhs)
        # try_divide/try_mod: ANSI mode (Spark 4 default) makes / and %
        # THROW on a zero divisor — one bad row must not kill a vectorized
        # batch; NULL (undefined) is the documented compiled-path analog of
        # the interpreter's per-row error
        col = {"+": a + b, "-": a - b, "*": a * b,
               "/": F.try_divide(a, b), "%": F.try_mod(a, b)}[op]
        return TypedCol(col, "number")
    if op in ("=", "!="):
        a, b, _ = _comparable(lhs, rhs)
        eq = F.coalesce(a == b, F.lit(False))
        return TypedCol(eq if op == "=" else F.coalesce(a != b, F.lit(False)),
                        "boolean")
    if op in ("<", "<=", ">", ">="):
        a, b, _ = _comparable(lhs, rhs)
        col = {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}[op]
        return TypedCol(col, "boolean")
    if op == "in":
        return _c_in(lhs, rhs)
    raise NotCompilable(f"operator {op!r}")


_VARIANT_NUM_RE = r"^(BIGINT|INT|SMALLINT|TINYINT|DOUBLE|FLOAT|DECIMAL)"


def _variant_typed(x: Column, kind: str) -> Column:
    """Extract a typed value from a variant ONLY when the variant's
    runtime type matches — JSONata equality is strict, so string "1"
    must never match number 1 (r7, ADVICE fix). Non-matching members
    become NULL = no match."""
    if kind == "number":
        return F.when(F.schema_of_variant(x).rlike(_VARIANT_NUM_RE),
                      F.try_variant_get(x, "$", "double"))
    if kind == "string":
        return F.when(F.schema_of_variant(x) == "STRING",
                      F.try_variant_get(x, "$", "string"))
    if kind == "boolean":
        return F.when(F.schema_of_variant(x) == "BOOLEAN",
                      F.try_variant_get(x, "$", "boolean"))
    raise NotCompilable(f"no typed variant extraction for kind {kind!r}")


def _variant_eq_strict(x: Column, y: Column) -> Column:
    """Strict JSONata scalar equality between two variants: equal only
    when same-typed and same-valued (explicit JSON nulls equal each
    other; objects/arrays compare as non-equal here — deep equality on
    compound members is interpreter territory)."""
    return F.coalesce(
        (_variant_typed(x, "number") == _variant_typed(y, "number"))
        | (_variant_typed(x, "string") == _variant_typed(y, "string"))
        | (_variant_typed(x, "boolean") == _variant_typed(y, "boolean"))
        | (F.is_variant_null(x) & F.is_variant_null(y)),
        F.lit(False),
    )


def _strict_eq(a_col: Column, a_kind: str, b_col: Column,
               b_kind: str) -> Column:
    """Strict scalar equality between two compiled values of (possibly)
    different static kinds — cross-typed pairs are statically False,
    variants are type-guarded at runtime (interpreter _jeq parity)."""
    if a_kind == "variant" and b_kind == "variant":
        return _variant_eq_strict(a_col, b_col)
    if a_kind == "variant" or b_kind == "variant":
        v, vk, t, tk = ((a_col, a_kind, b_col, b_kind)
                        if a_kind == "variant"
                        else (b_col, b_kind, a_col, a_kind))
        if tk in ("number", "string", "boolean"):
            return _variant_typed(v, tk) == t
        if tk == "null":
            return F.is_variant_null(v)
        return F.lit(False)
    if a_kind == b_kind and a_kind in ("number", "string", "boolean"):
        return a_col == b_col
    if a_kind == b_kind == "null":
        return F.lit(True)
    return F.lit(False)


def _member_eq(lhs: TypedCol, m: TypedCol, splice: bool = False) -> Column:
    """One membership test for the literal-array ``in`` path. A SEQUENCE
    member (path map / range result) contributes each of its items; a
    non-seq array member is a nested array VALUE a scalar lhs never
    equals. ``splice`` marks a variant member compiled from a PATH node
    — its re-encoded array form is a sequence (splices), while a name
    lookup's array is a value (nests)."""
    if m.is_seq and m.kind.startswith("array"):
        elem = m.elem or "variant"
        lc, lk = lhs.col, lhs.kind
        return F.exists(
            m.col,
            lambda x: F.coalesce(_strict_eq(lc, lk, x, elem), F.lit(False)),
        )
    if m.kind.startswith("array"):
        return F.lit(False)
    if m.kind == "variant" and splice:
        lc, lk = lhs.col, lhs.kind

        def test(v: Column) -> Column:
            arr = F.try_variant_get(v, "$", "array<variant>")
            return F.when(
                arr.isNotNull(),
                F.exists(arr, lambda x: F.coalesce(
                    _strict_eq(lc, lk, x, "variant"), F.lit(False))),
            ).otherwise(_strict_eq(lc, lk, v, "variant"))

        return _let(m.col, test)
    return _strict_eq(lhs.col, lhs.kind, m.col, m.kind)


def _c_in(lhs: TypedCol, rhs: TypedCol) -> TypedCol:
    """JSONata ``in``: membership with STRICT equality; a non-array rhs
    is a singleton array (interpreter.py:309-313)."""
    if lhs.is_seq and lhs.kind.startswith("array"):
        lhs = _seq_scalar(lhs)
    if rhs.kind == "variant":
        def wrap(v: Column) -> Column:
            return F.coalesce(
                F.try_variant_get(v, "$", "array<variant>"),
                F.when(v.isNotNull(), F.array(v)),
            )

        rhs = TypedCol(_let(rhs.col, wrap), "array<variant>", elem="variant")
    elif rhs.kind in ("number", "string", "boolean"):
        rhs = TypedCol(F.array(rhs.col), f"array<{rhs.kind}>", elem=rhs.kind)
    if not rhs.kind.startswith("array"):
        raise NotCompilable("'in' requires a compiled array rhs")
    relem = rhs.elem or "variant"
    if relem == "variant":
        if lhs.kind in ("number", "string", "boolean"):
            # type-guarded member cast: only same-typed members can match
            rhs_col = F.transform(rhs.col,
                                  lambda x: _variant_typed(x, lhs.kind))
            a = lhs.col
        elif lhs.kind == "variant":
            lc = lhs.col
            return TypedCol(
                F.coalesce(
                    F.exists(rhs.col, lambda x: _variant_eq_strict(x, lc)),
                    F.lit(False)),
                "boolean",
            )
        else:
            raise NotCompilable(f"'in' lhs kind {lhs.kind!r}")
    elif lhs.kind == "variant":
        # typed members: lhs variant must be same-typed to match
        a = _variant_typed(lhs.col, relem)
        rhs_col = rhs.col
    elif lhs.kind == relem:
        a, rhs_col = lhs.col, rhs.col
    else:
        # statically different scalar types never match (strict equality)
        return TypedCol(F.lit(False), "boolean")
    return TypedCol(
        F.coalesce(F.array_contains(rhs_col, a), F.lit(False)), "boolean"
    )


def _coerce_to(tc: TypedCol, kind: str | None) -> Column:
    if kind == "number":
        return as_number(tc)
    if kind == "string":
        return as_string(tc)
    if kind == "boolean":
        return as_boolean(tc)
    raise NotCompilable(f"cannot coerce variant to {kind}")


def _comparable(a: TypedCol, b: TypedCol) -> tuple[Column, Column, str]:
    # sequences compare as their singleton item (JSONata sequence rule);
    # a larger sequence against a scalar is never equal -> NULL operand
    if a.is_seq and a.kind.startswith("array"):
        a = _seq_scalar(a)
    if b.is_seq and b.kind.startswith("array"):
        b = _seq_scalar(b)
    kinds = {a.kind, b.kind}
    if kinds == {"variant"}:
        raise NotCompilable("comparison with both sides of unknown type")
    if "variant" in kinds:
        known = a.kind if b.kind == "variant" else b.kind
        return _coerce_to(a, known) if a.kind == "variant" else a.col, \
            _coerce_to(b, known) if b.kind == "variant" else b.col, known
    if a.kind == b.kind:
        return a.col, b.col, a.kind
    if kinds == {"number", "null"} or kinds == {"string", "null"}:
        return a.col, b.col, "null"
    raise NotCompilable(f"cannot compare kinds {a.kind} and {b.kind}")


def _c_array(node, ctx):
    """JSONata cons semantics (pinned by interpreter probes): SEQUENCE
    items (ranges, path maps, HOF results) flatten into the constructed
    array and empty sequences contribute nothing; array VALUES nest as
    single elements ([nums] is [[...]], [[1,2],[3]] stays nested);
    undefined items drop ([missing, 1] is [1]) while literal nulls stay;
    the result is an ARRAY VALUE (never boundary-unwrapped: [one.q]
    stays a 1-element array)."""
    items = [_compile(i, ctx) for i in node["items"]]
    if not items:
        return TypedCol(F.array(), "array<string>", elem="string")

    def is_splice(i: TypedCol) -> bool:
        return i.kind.startswith("array") and i.is_seq

    def part_kind(i: TypedCol) -> str:
        return (i.elem or "variant") if is_splice(i) else i.kind

    all_kinds = {part_kind(i) for i in items}
    if all_kinds <= {"number", "variant", "null"} and "number" in all_kinds:
        elem, coerce, sql = "number", as_number, "double"
    elif all_kinds <= {"string", "variant", "null"} and "string" in all_kinds:
        elem, coerce, sql = "string", as_string, "string"
    elif all_kinds <= {"variant", "null"}:
        elem, coerce, sql = "variant", (lambda i: i.col), "variant"
    elif len(all_kinds) == 1 and next(iter(all_kinds)).startswith("array"):
        # nested array values of one kind: [[1,2],[3]]
        elem, coerce, sql = next(iter(all_kinds)), (lambda i: i.col), None
    else:
        raise NotCompilable(f"array constructor with mixed kinds {all_kinds}")

    parts = []
    for raw, i in zip(node["items"], items):
        if is_splice(i):
            part = (_as_array(i, sql)
                    if elem != "variant" and (i.elem or "variant") == "variant"
                    else i.col)
            # an undefined (NULL) sequence contributes nothing — concat
            # would otherwise null the whole constructed array
            parts.append(F.coalesce(part, F.array()))
        elif i.kind == "null" and raw["type"] != "null":
            # statically-absent path: contributes nothing
            continue
        else:
            one = F.array(coerce(i)) if not i.kind.startswith("array") \
                else F.array(i.col)
            if i.kind == "variant":
                # runtime-undefined drops; explicit JSON null (variant
                # null, not SQL null) stays
                one = F.filter(one, lambda r: r.isNotNull())
            parts.append(one)
    if not parts:
        return TypedCol(F.array(), "array<string>", elem="string")
    col = parts[0] if len(parts) == 1 else F.concat(*parts)
    return TypedCol(col, f"array<{elem}>", elem=elem)


def _c_object(node, ctx):
    fields = []
    names = []
    for key_node, val_node in node["pairs"]:
        if key_node["type"] != "string":
            raise NotCompilable("object constructor with computed key")
        # sequence values obey the boundary rules inside constructors too:
        # {"q": one.q} is the item, not a 1-element array
        val = _seq_boundary(_compile(val_node, ctx))
        fields.append(val.col.alias(key_node["value"]))
        names.append(key_node["value"])
    return TypedCol(F.struct(*fields), "object", fields=names)


def _c_range(node, ctx):
    lo = as_number(_compile(node["lhs"], ctx))
    hi = as_number(_compile(node["rhs"], ctx))
    # JSONata `a..b`: empty when a > b (Spark's sequence would count DOWN);
    # non-integer bounds are a type error (T2003) -> the documented
    # error->null divergence class on the compiled path.
    ok = (lo == F.floor(lo)) & (hi == F.floor(hi))
    col = (
        F.when(ok & (lo <= hi), F.sequence(lo.cast("long"), hi.cast("long")))
        .when(ok, F.array().cast("array<long>"))
    )
    # ranges are SEQUENCES: bare `5..5` is 5, `5..1` undefined, and
    # `[1..3, 7..9]` splices — all from is_seq + the boundary rules
    return TypedCol(col, "array<number>", elem="number", is_seq=True)


def _c_apply(node, ctx):
    """lhs ~> fn  /  lhs ~> $fn(args): rewrite as a call with lhs first."""
    rhs = node["rhs"]
    if rhs["type"] == "call":
        call = {"type": "call", "proc": rhs["proc"],
                "args": [node["lhs"]] + rhs["args"]}
        return _c_call(call, ctx)
    if rhs["type"] == "variable":
        call = {"type": "call", "proc": rhs, "args": [node["lhs"]]}
        return _c_call(call, ctx)
    if rhs["type"] == "transform":
        return _c_transform_apply(node["lhs"], rhs, ctx)
    raise NotCompilable("~> rhs must be a function")


def _transform_location_steps(pat) -> list[tuple[str | None, dict | None]]:
    """Location patterns that compile (r10 widens r9's literal-name-only
    subset): bare root ``$`` (-> []), or a path of name / ``*`` steps
    where a NAME step may carry one static predicate
    (``items[price>10]``). Returns [(name | None, pred_node | None)];
    name None = wildcard. Everything else — indexes, descendants,
    expressions, predicates on wildcards — falls back to the
    interpreter."""
    if pat["type"] == "variable" and pat["value"] == "":
        return []

    def step(n):
        if n["type"] == "name":
            return [(n["value"], None)]
        if n["type"] == "wildcard":
            return [(None, None)]
        if n["type"] == "predicate" and n["expr"]["type"] == "name":
            return [(n["expr"]["value"], n["cond"])]
        return None

    def walk(n):
        if n["type"] == "path":
            lhs, rhs = walk(n["lhs"]), walk(n["rhs"])
            if lhs is not None and rhs is not None:
                return lhs + rhs
            return None
        return step(n)

    steps = walk(pat)
    if steps is None:
        raise NotCompilable(
            "only $, name/wildcard paths, and static boolean or literal "
            "index predicates on name steps compile as transform "
            "locations")
    return steps


def _transform_deletes(tnode) -> list[str]:
    deletes: list[str] = []
    dnode = tnode["delete"]
    if dnode is not None:
        items = dnode["items"] if dnode["type"] == "array" else [dnode]
        for it in items:
            if it["type"] != "string":
                raise NotCompilable(
                    "transform delete must be literal strings")
            deletes.append(it["value"])
    return deletes


def _dtype_of(tc: TypedCol):
    """Full Spark DataType of a compiled value when statically known
    (typed-path invariant: numbers are always double), else None. Note
    TypedCol.dtype holds the ELEMENT type for arrays."""
    import pyspark.sql.types as T

    if tc.kind == "number":
        return T.DoubleType()
    if tc.kind == "string":
        return T.StringType()
    if tc.kind == "boolean":
        return T.BooleanType()
    if tc.kind == "object" and isinstance(tc.dtype, T.StructType):
        return tc.dtype
    if tc.kind.startswith("array") and tc.dtype is not None:
        return T.ArrayType(tc.dtype)
    return None


def _apply_update(col, schema, tnode, ctx, cond=None):
    """Merge the transform's literal update object into ONE matched
    struct instance and drop the deletes — JS ``dict.update`` semantics
    map exactly onto a struct rebuild (existing keys keep their position
    and take the new value, new keys append in update order, deletes
    drop fields). Returns (Column, StructType | None): the output type
    is statically derivable unless an appended value's type is unknown
    (e.g. a constructed object), in which case the value is still
    compiled but downstream composition falls back.

    Update values are arbitrary compilable expressions evaluated with
    the match as context — mirroring the interpreter, which builds the
    whole update object against the pre-merge match before mutating.

    ``cond`` (r10, predicate locations): a boolean Column gating whether
    THIS instance is a match. Matched and unmatched instances must share
    one Spark type (they sit in the same array / field), so in cond
    mode deletes are NULLED rather than dropped and appended fields are
    NULL on unmatched instances — both read back as absent under the
    typed path's null==absent convention, matching the interpreter's
    output after JSON serialization drops nulls.

    Typed-path divergence (the documented null==absent convention): an
    update value that evaluates NULL keeps the original field value
    (the interpreter's object constructor drops undefined keys, so this
    matches for undefined; an explicit JSON ``null`` update value
    diverges, like every other null on the typed path)."""
    import pyspark.sql.types as T

    deletes = _transform_deletes(tnode)
    inner = ctx.down(root=col, root_kind="object", root_schema=schema)
    updates: dict[str, TypedCol] = {}
    upd_order: list[str] = []
    for key_node, val_node in tnode["update"]["pairs"]:
        if key_node["type"] != "string":
            raise NotCompilable("transform update keys must be literal")
        key = key_node["value"]
        updates[key] = _seq_boundary(_compile(val_node, inner))
        if key not in upd_order:
            upd_order.append(key)

    orig_fields = schema.fieldNames()
    out_cols, out_fields = [], []
    all_known = True
    for f in schema.fields:
        orig = col[f.name]
        if f.name in deletes:
            if cond is None:
                continue
            out_cols.append(
                F.when(cond, F.lit(None).cast(f.dataType)).otherwise(orig)
                .alias(f.name))
            out_fields.append(T.StructField(f.name, f.dataType, True))
        elif f.name in updates:
            val = updates[f.name]
            orig_kind = _typed_from(orig, f.dataType).kind
            if val.kind not in (orig_kind, "null"):
                # a when() needs one result type; cross-kind in-place
                # updates fall back rather than miscast
                raise NotCompilable(
                    f"update changes field {f.name!r} kind "
                    f"{orig_kind} -> {val.kind}")
            if val.kind == "null":
                out_dt = f.dataType  # merged is always the original
            elif orig_kind == "number":
                out_dt = T.DoubleType()  # when() unifies long/double
            elif orig_kind in ("string", "boolean"):
                out_dt = f.dataType
            else:
                # struct/array in-place updates: when() needs EXACTLY
                # matching branch types; a mismatch would only surface
                # as an analysis error at runtime, so fall back instead
                if _dtype_of(val) != f.dataType:
                    raise NotCompilable(
                        f"update changes field {f.name!r} Spark type")
                out_dt = f.dataType
            gate = val.col.isNotNull() if cond is None \
                else (cond & val.col.isNotNull())
            merged = F.when(gate, val.col).otherwise(orig)
            out_cols.append(merged.alias(f.name))
            out_fields.append(T.StructField(f.name, out_dt, True))
        else:
            out_cols.append(orig.alias(f.name))
            out_fields.append(f)
    for key in upd_order:
        if key in orig_fields or key in deletes:
            continue
        app = updates[key].col if cond is None else F.when(cond,
                                                           updates[key].col)
        out_cols.append(app.alias(key))
        dt = _dtype_of(updates[key])
        if dt is None:
            all_known = False
        else:
            out_fields.append(T.StructField(key, dt, True))

    # transform(undefined) -> undefined: a NULL match stays NULL instead
    # of becoming a struct of NULLs
    out = F.when(col.isNotNull(), F.struct(*out_cols))
    return out, (T.StructType(out_fields) if all_known else None)


def _transform_loc_index(pred):
    """Static literal numeric predicate -> JSONata index selection
    (floored, negative from the end), else None."""
    import math

    if pred["type"] == "number":
        return math.floor(pred["value"])
    if pred["type"] == "unary-" and pred["expr"]["type"] == "number":
        return math.floor(-pred["expr"]["value"])
    return None


def _transform_pred(pred, val, schema, ctx):
    """Compile a transform-location predicate with one candidate match
    as context. Compiled subset: the predicate must STATICALLY be
    boolean — a numeric result would be JSONata index selection
    (_transform_loc_dynamic handles the context-free numeric case) and
    a variant result could turn numeric at runtime, so both fall back.
    Outer ``:=`` bindings reach the predicate through ``ctx.down``'s
    binding copy (r11, VERDICT r10 Next-round #6 — verified by the
    differential suite: ``|items[price > $threshold]|`` compiles)."""
    child = ctx.down(root=val, root_kind="object", root_schema=schema)
    ptc = _compile(pred, child)
    if ptc.kind != "boolean":
        raise NotCompilable(
            "transform-location predicates must be statically boolean "
            "(numeric predicates are index selection)")
    return ptc.col


def _transform_loc_dynamic(pred, ctx):
    """COMPUTED index locations (r11, VERDICT r10 Next-round #6):
    ``|items[$i]|...|`` where the predicate is context-FREE and
    statically numeric — e.g. an outer ``:=`` binding or arithmetic
    over one — compiles to dynamic index selection (floored, negative
    from the end), mirroring the nav path's computed-index rule
    (_c_path's index_into). Returns the long index Column, or None when
    the predicate is not this shape (context-reading or non-numeric —
    boolean predicates keep the _transform_pred path; genuinely dynamic
    per-item numeric locations keep falling back to the interpreter)."""
    if _reads_context(pred):
        return None
    try:
        child = ctx.down(root=ctx.root, root_kind=ctx.root_kind,
                         root_schema=ctx.root_schema, raw=ctx.raw)
        ptc = _compile(pred, child)
    except NotCompilable:
        return None
    if ptc.kind != "number":
        return None
    return F.floor(ptc.col).cast("long")


def _transform_descend(val, dtv, pred, rest, tnode, ctx, cond):
    """Continue the location walk into one field value, narrowing the
    match gate by the step's predicate (if any). With a predicate, the
    field must be a struct or array<struct> — the only shapes where the
    interpreter's per-item predicate matches objects we can rebuild."""
    import pyspark.sql.types as T

    if pred is None:
        return _transform_at(val, dtv, rest, tnode, ctx, cond=cond)
    idx = _transform_loc_index(pred)
    dyn = None if idx is not None else _transform_loc_dynamic(pred, ctx)
    if isinstance(dtv, T.ArrayType) and isinstance(dtv.elementType,
                                                   T.StructType):
        et = dtv.elementType
        new_et = _transform_at(F.lit(None), et, rest, tnode, ctx,
                               cond=F.lit(True))[1]
        if dyn is not None:
            # COMPUTED index selection (r11): [expr] where expr is
            # context-free numeric (outer bindings/arithmetic) — the
            # target position resolves at runtime, negative from the
            # end, out-of-range = no match
            tgt = F.when(dyn >= 0, dyn).otherwise(
                F.size(val).cast("long") + dyn)

            def one_d(x, i):
                c = i.cast("long") == tgt
                c = c if cond is None else (cond & c)
                return _transform_at(x, et, rest, tnode, ctx, cond=c)[0]

            return F.transform(val, one_d), (
                T.ArrayType(new_et) if new_et is not None else None)
        if idx is not None:
            # literal INDEX selection (r10): [n] matches the element at
            # position n, negative from the end, out-of-range = no match
            tgt = F.lit(idx) if idx >= 0 else F.size(val) + F.lit(idx)

            def one_i(x, i):
                c = i == tgt
                c = c if cond is None else (cond & c)
                return _transform_at(x, et, rest, tnode, ctx, cond=c)[0]

            return F.transform(val, one_i), (
                T.ArrayType(new_et) if new_et is not None else None)

        def one(x):
            c = _transform_pred(pred, x, et, ctx)
            c = c if cond is None else (cond & c)
            return _transform_at(x, et, rest, tnode, ctx, cond=c)[0]

        return F.transform(val, one), (
            T.ArrayType(new_et) if new_et is not None else None)
    if isinstance(dtv, T.StructType):
        if dyn is not None:
            # scalar-as-singleton-sequence, computed: [0]/[-1] select
            # the value itself, decided at runtime
            c = dyn.isin(0, -1)
            c = c if cond is None else (cond & c)
            return _transform_at(val, dtv, rest, tnode, ctx, cond=c)
        if idx is not None:
            # scalar-as-singleton-sequence: [0] and [-1] select the
            # value itself, any other index is no match
            if idx in (0, -1):
                return _transform_at(val, dtv, rest, tnode, ctx, cond=cond)
            return val, dtv
        c = _transform_pred(pred, val, dtv, ctx)
        c = c if cond is None else (cond & c)
        return _transform_at(val, dtv, rest, tnode, ctx, cond=c)
    if idx is not None or dyn is not None:
        return val, dtv  # non-object match (scalar / array<scalar>): untouched
    raise NotCompilable(
        "transform-location predicate over a non-object field")


def _transform_at(col, dt, steps, tnode, ctx, cond=None):
    """Apply the transform's update at every match of the location path
    ``steps`` under (col, dt), rebuilding the enclosing structure in
    place — the Column-plan mirror of the interpreter's
    clone-navigate-mutate (interpreter.py Transform.__call__): a name
    step maps over array members, a ``*`` step matches every field, an
    array-valued FINAL match updates its object elements one level deep
    (iter_items does not flatten nested arrays at the match position),
    and non-object matches are left untouched. ``cond`` (predicate
    locations, r10) gates the eventual update — see _apply_update.
    Returns (Column, DataType | None)."""
    import pyspark.sql.types as T

    if isinstance(dt, T.ArrayType):
        et = dt.elementType
        if not steps and not isinstance(et, T.StructType):
            return col, dt  # non-object matches untouched
        # dry run for the element's output type (compile is symbolic —
        # same trick as _typed_navigate's dry run)
        new_et = _transform_at(F.lit(None), et, steps, tnode, ctx,
                               cond=cond)[1]
        mapped = F.transform(
            col, lambda x: _transform_at(x, et, steps, tnode, ctx,
                                         cond=cond)[0])
        return mapped, (T.ArrayType(new_et) if new_et is not None else None)
    if isinstance(dt, T.StructType):
        if not steps:
            return _apply_update(col, dt, tnode, ctx, cond=cond)
        (head, pred), rest = steps[0], steps[1:]
        if head is not None and head not in dt.fieldNames():
            return col, dt  # no match: the clone is returned unchanged
        out_cols, out_fields = [], []
        all_known = True
        for f in dt.fields:
            if head is None or f.name == head:
                child, child_dt = _transform_descend(
                    col[f.name], f.dataType, pred, rest, tnode, ctx, cond)
                out_cols.append(child.alias(f.name))
                if child_dt is None:
                    all_known = False
                else:
                    out_fields.append(T.StructField(f.name, child_dt, True))
            else:
                out_cols.append(col[f.name].alias(f.name))
                out_fields.append(f)
        rebuilt = F.when(col.isNotNull(), F.struct(*out_cols))
        return rebuilt, (T.StructType(out_fields) if all_known else None)
    # scalar mid-path (no match) or scalar final match (non-object)
    return col, dt


def _c_transform_apply(lhs_node, tnode, ctx):
    """``obj ~> |location|{...}, [...]|`` on the TYPED path: a transform
    over a schema-known struct compiles to an in-place struct rebuild at
    every match of the location, so the whole transform stays inside the
    Column plan with no interpreter fallback — and the result carries
    its output StructType, so navigation and chained transforms over the
    result stay compiled too.

    Compiled subset (everything else -> NotCompilable -> interpreter,
    full semantics): location must be the bare root ``$`` or a path of
    literal names / ``*`` wildcards where a name step may carry one
    statically-boolean predicate (``items[price>10]``) or one literal
    index (``items[0]``, floored, negative from the end — r10; computed
    locations and dynamic numeric predicates fall back); the applied
    value must be a schema-known object (the typed path's message
    root); the update must be a literal object constructor with literal
    string keys; deletes must be a literal string or an array of
    literal strings. See _apply_update / _transform_at for the match
    semantics and the documented null==absent divergence."""
    import pyspark.sql.types as T

    steps = _transform_location_steps(tnode["pattern"])
    if tnode["update"]["type"] != "object":
        raise NotCompilable(
            "transform update must be a literal object constructor")
    _transform_deletes(tnode)  # validate literal-ness before recursing

    base = _seq_boundary(_compile(lhs_node, ctx))
    if base.kind != "object" or not isinstance(base.dtype, T.StructType):
        raise NotCompilable(
            "transform compiles only over a schema-known typed object")

    if lhs_node["type"] == "apply":
        # Compiler-level let for CHAINED transforms (`x ~> t1 ~> t2`):
        # the second rebuild references every field of the first
        # rebuild's CaseWhen-wrapped struct, so inlining the lhs per
        # field grows the expression tree GEOMETRICALLY with chain
        # length (measured pre-fix: 0.9k -> 5.6k -> 50k expression
        # chars for 1/2/3 stages, analysis 0.5 -> 2.6 -> 9.3 s). Bind
        # the intermediate once as a lambda variable so each stage adds
        # a constant-size layer and chains grow linearly.
        dt_cell: list = []

        def _bound(c):
            col2, dt2 = _transform_at(c, base.dtype, steps, tnode, ctx)
            dt_cell.append(dt2)
            return col2

        col, dt = _let(base.col, _bound), dt_cell[0]
    else:
        col, dt = _transform_at(base.col, base.dtype, steps, tnode, ctx)
    if isinstance(dt, T.StructType):
        return TypedCol(col, "object", fields=dt.fieldNames(), dtype=dt)
    return TypedCol(col, "object",
                    fields=base.dtype.fieldNames() if steps else None)


def _c_call(node, ctx):
    proc = node["proc"]
    if proc["type"] != "variable":
        raise NotCompilable("only $function calls compile")
    name = proc["value"]
    fn = _FUNCTIONS.get(name)
    if fn is None:
        raise NotCompilable(f"function ${name} not compilable")
    if name in _RAW_ARG_FNS:  # handler walks node["args"] itself
        return fn([], node, ctx)
    args = [
        TypedCol(F.lit(None), "regex") if a["type"] == "regex"
        else TypedCol(F.lit(None), "lambda") if a["type"] == "lambda"
        else _seq_arg(_compile(a, ctx))
        for a in node["args"]
    ]
    return fn(args, node, ctx)


def _seq_arg(tc: TypedCol) -> TypedCol:
    """Function-argument sequence rule: an EMPTY sequence is undefined and
    propagates as NULL into the callee ($reverse(empty-seq) -> undefined,
    $sum(empty-seq) -> undefined, $exists(empty-seq) -> false), unlike an
    empty array VALUE ($reverse([]) -> [], $sum([]) -> 0) which keeps
    kind array un-flagged and passes through untouched."""
    if tc.is_seq and tc.kind.startswith("array"):
        guarded = _let(tc.col, lambda c: F.when(F.size(c) > 0, c))
        return TypedCol(guarded, tc.kind,
                        elem=tc.elem, dtype=tc.dtype, is_seq=True)
    return tc


def _hof_array(tc: TypedCol) -> tuple[Column, str, object | None]:
    """Coerce a compiled value to (array Column, element kind, element
    Spark dtype — typed path only) for HOFs."""
    if tc.kind == "variant":
        # non-array values are singleton sequences (`$map(one.q, fn)`
        # where the navigation collapsed to the item)
        return _as_array(tc, "variant"), "variant", None
    if tc.kind.startswith("array"):
        return tc.col, tc.elem or "variant", tc.dtype
    raise NotCompilable(f"kind {tc.kind} is not an array")


def _elem_tc(col: Column, elem: str, elem_dt) -> TypedCol:
    """TypedCol for one HOF lambda element."""
    if elem == "object" and elem_dt is not None:
        return TypedCol(col, "object", fields=elem_dt.fieldNames(),
                        dtype=elem_dt)
    return TypedCol(col, elem, dtype=elem_dt)


def _lambda_arg(node, i, max_params, what):
    args = node["args"]
    if i >= len(args) or args[i]["type"] != "lambda":
        raise NotCompilable(f"{what} needs an inline lambda")
    lam = args[i]
    if not 1 <= len(lam["params"]) <= max_params:
        raise NotCompilable(f"{what} lambda takes 1..{max_params} params")
    if lam.get("signature") is not None:
        # signature validation (type errors, array promotion, context
        # substitution) is runtime behavior the Column tree can't express
        # faithfully -> interpreter
        raise NotCompilable(f"{what} lambda declares a signature")
    return lam


def _bind_lambda(lam, bindings: list[TypedCol], ctx: Ctx) -> TypedCol:
    """Compile a lambda body with its params bound to HOF lambda variables.
    Spark invokes the Python callback once at expression-build time, so the
    body is compiled exactly once — no per-row Python."""
    child = ctx.down(root=ctx.root, root_kind=ctx.root_kind,
                     root_schema=ctx.root_schema, raw=ctx.raw)
    for name, tc in zip(lam["params"], bindings):
        child.bindings[name] = tc
    return _compile(lam["body"], child)


def _c_sort(node, ctx):
    """Order-by ``expr ^ (key1, >key2)`` — record-scoped multi-key array
    sort (SURVEY.md §2.5; reference semantics via the JSONata dep at
    bin/mqtt-streamr.js:158). Maps to ``array_sort`` with a comparator;
    later terms are tie-breakers. Sort keys must compile to numbers or
    strings; ties on every term compare equal (stable order not
    guaranteed, unlike JSONata's stable merge sort — differential tests
    use distinct keys)."""
    base = _compile(node["expr"], ctx)
    arr, elem, elem_dt = _hof_array(base)
    terms = node["terms"]
    identity = (
        len(terms) == 1
        and terms[0]["expr"]["type"] == "variable"
        and terms[0]["expr"]["value"] == ""
    )
    if identity and elem in ("number", "string"):
        col = F.sort_array(arr, asc=not terms[0]["descending"])
        return TypedCol(col, f"array<{elem}>", elem=elem)
    if elem == "variant":
        elem_dt = None
    elif not (elem == "object" and elem_dt is not None):
        raise NotCompilable("order-by terms need variant/struct elements")

    def key_of(term, x: Column) -> TypedCol:
        tc = _compile(term["expr"],
                      ctx.down(root=x, root_kind=elem,
                               root_schema=elem_dt))
        if tc.kind in ("number", "string", "variant"):
            return tc
        raise NotCompilable(f"order-by key of kind {tc.kind}")

    def comp(le: Column, r: Column) -> Column:
        out = F.lit(0)
        for term in reversed(terms):
            ltc, rtc = key_of(term, le), key_of(term, r)
            lt, gt = (1, -1) if term["descending"] else (-1, 1)

            def term_cmp(lk: Column, rk: Column,
                         lkind=ltc.kind, rkind=rtc.kind) -> Column:
                if "variant" in (lkind, rkind):
                    # JSONata sorts all-number or all-string keys;
                    # dispatch per row — STRING keys compare lexically,
                    # anything else numerically (mixed keys are a JSONata
                    # type error -> error->null leaves order unchanged)
                    lv, rv = TypedCol(lk, lkind), TypedCol(rk, rkind)
                    ls, rs = as_string(lv), as_string(rv)
                    ln, rn = as_number(lv), as_number(rv)
                    both_str = (
                        (F.schema_of_variant(lk) == "STRING")
                        if lkind == "variant" else F.lit(lkind == "string")
                    ) & (
                        (F.schema_of_variant(rk) == "STRING")
                        if rkind == "variant" else F.lit(rkind == "string")
                    )
                    is_lt = F.when(both_str, ls < rs).otherwise(ln < rn)
                    is_gt = F.when(both_str, ls > rs).otherwise(ln > rn)
                else:
                    is_lt, is_gt = lk < rk, lk > rk
                return (F.when(is_lt, F.lit(lt)).when(is_gt, F.lit(gt))
                        .otherwise(F.lit(0)))

            # _let-bind each key: the comparator references a key up to
            # 4 times and the key tree itself can be a full path walk.
            # Plain closures only — default-arg lambdas change arity and
            # F.transform would bind the array index column to them.
            def bind_keys(lcol: Column, rcol: Column, cmp_fn) -> Column:
                def outer(lk: Column) -> Column:
                    def inner(rk: Column) -> Column:
                        return cmp_fn(lk, rk)
                    return _let(rcol, inner)
                return _let(lcol, outer)

            t = bind_keys(ltc.col, rtc.col, term_cmp)
            out = F.when(t != 0, t).otherwise(out)
        return out

    return TypedCol(F.array_sort(arr, comp), f"array<{elem}>", elem=elem,
                    dtype=elem_dt)


def _c_groupby(node, ctx):
    """Object-constructor grouping ``seq{key: value}`` over a sequence with
    statically-known element type: group members by the per-item key string,
    then evaluate ``value`` once per group with the member SEQUENCE as
    context (JSONata group-by). Compiles to array_distinct over the keys +
    map_from_entries — entirely Column work. Scalar-valued results map to
    a typed map (the common aggregate shape ``{cat: $sum(price)}``, best
    codegen); SEQUENCE-valued results (r7, previously interpreter-only)
    re-encode per group as VARIANT — one static column type that can hold
    "the item when the group is a singleton, the array otherwise"
    (JSONata's group unwrap rule) via the same _seq_boundary as every
    other sequence; undefined-valued groups drop their key (object
    constructor rule)."""
    if len(node["pairs"]) != 1:
        raise NotCompilable("group-by with multiple pairs")
    key_node, val_node = node["pairs"][0]
    base = _compile(node["expr"], ctx)
    if base.kind == "null":
        return base
    arr, elem, elem_dt = _hof_array(base)

    def keyfn(x: Column) -> Column:
        child = ctx.down(root=x, root_kind=elem, root_schema=elem_dt)
        return as_string(_compile(key_node, child))

    keys = F.array_distinct(
        F.filter(F.transform(arr, keyfn), lambda k: k.isNotNull())
    )

    def group_val(k: Column) -> TypedCol:
        members = F.filter(arr, lambda y: keyfn(y) == k)
        child = ctx.down(root=members, root_kind=f"array<{elem}>",
                         root_schema=elem_dt, root_is_seq=True)
        return _compile(val_node, child)

    def valfn(k: Column) -> Column:
        v = group_val(k)
        if v.kind not in ("number", "string", "boolean"):
            raise NotCompilable(
                f"group-by value of kind {v.kind} (needs singleton unwrap)"
            )
        return v.col

    def valfn_variant(k: Column) -> Column:
        v = group_val(k)
        if v.is_seq and v.kind.startswith("array"):
            return _seq_boundary(v).col  # singleton/empty boundary, variant
        if v.kind == "variant":
            return v.col
        if v.kind in ("number", "string", "boolean", "object", "null") \
                or v.kind.startswith("array"):
            return F.parse_json(to_json_string(v))
        raise NotCompilable(f"group-by value of kind {v.kind}")

    try:
        valfn(F.lit("probe"))  # raise NotCompilable at compile, not later
        fn = valfn
    except NotCompilable:
        valfn_variant(F.lit("probe"))
        fn = valfn_variant
    entries = F.filter(
        F.transform(
            keys, lambda k: F.struct(k.alias("key"), fn(k).alias("value"))
        ),
        # an undefined group value drops its key (object-constructor
        # rule); only the variant mode can produce one (scalar aggregates
        # over a non-empty group are total)
        lambda e: e.getField("value").isNotNull(),
    )
    # a MapType renders as a JSON object via to_json, matching the
    # reference's published payload shape; dynamic keys cannot be a struct
    return TypedCol(F.map_from_entries(entries), "object")


_NODES = {
    "number": _c_number,
    "sort": _c_sort,
    "string": _c_string,
    "boolean": _c_boolean,
    "null": _c_null,
    "name": _c_name,
    "path": _c_path,
    "descendants": _c_descendants,
    "predicate": _c_predicate,
    "variable": _c_variable,
    "block": _c_block,
    "bind": _c_bind,
    "unary-": _c_unary_minus,
    "condition": _c_condition,
    "binary": _c_binary,
    "array": _c_array,
    "object": _c_object,
    "range": _c_range,
    "apply": _c_apply,
    "call": _c_call,
    "groupby": _c_groupby,
}


# --- compiled function library ----------------------------------------------

def _js_regex_to_java(pattern: str, flags: str) -> str:
    from mqtt_streamr_spark.jsonata.regexes import js_fidelity_rewrite

    # Java's \s is ASCII-only while JS (the reference engine) matches
    # Unicode whitespace — rewrite \s/\S to the explicit JS set (r8;
    # \d/\w/\b are already ASCII in Java, matching JS; shared table in
    # jsonata/regexes.py)
    pattern = js_fidelity_rewrite(pattern, "java")
    prefix = ""
    if "i" in flags:
        prefix += "i"
    if "m" in flags:
        prefix += "m"
    if "s" in flags:
        prefix += "s"
    return f"(?{prefix}){pattern}" if prefix else pattern


def _arg_regex(node_args, i):
    """Extract a regex literal AST arg (regexes aren't data values here)."""
    a = node_args[i]
    if a["type"] == "regex":
        return _js_regex_to_java(a["pattern"], a["flags"])
    return None


def _count_capture_groups(rx: str) -> int:
    """Statically count capture groups in a Java regex: unescaped ``(``
    outside character classes, excluding ``(?...`` constructs."""
    n, i, in_class = 0, 0, False
    while i < len(rx):
        c = rx[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
        elif c == "(" and rx[i + 1:i + 2] != "?":
            n += 1
        i += 1
    return n


# constructs whose match positions depend on surrounding context — the
# position()-walk index reconstruction in $match is unsound for these
# (conservative: a literal ^ inside a character class also matches)
_POSITION_DEPENDENT = _re.compile(r"\(\?<?[=!]|\\b|\\B|\^|\$")
_LOOKAROUND = _re.compile(r"\(\?<?[=!]")
_ANCHORS = _re.compile(r"\\b|\\B|\^|\$")


# functions whose arguments cannot be pre-compiled as values (e.g. an array
# literal of heterogeneous objects) — their handlers walk the AST directly
_RAW_ARG_FNS = {"merge"}


def _fn(name):
    def deco(f):
        _FUNCTIONS[name] = f
        return f

    return deco


_FUNCTIONS: dict = {}


@_fn("string")
def _fc_string(args, node, ctx):
    return TypedCol(as_string(args[0]), "string")


@_fn("number")
def _fc_number(args, node, ctx):
    return TypedCol(as_number(args[0]), "number")


@_fn("boolean")
def _fc_boolean(args, node, ctx):
    return TypedCol(as_boolean(args[0]), "boolean")


@_fn("not")
def _fc_not(args, node, ctx):
    return TypedCol(~as_boolean(args[0]), "boolean")


@_fn("exists")
def _fc_exists(args, node, ctx):
    return TypedCol(args[0].col.isNotNull(), "boolean")


@_fn("uppercase")
def _fc_upper(args, node, ctx):
    return TypedCol(F.upper(as_string(args[0])), "string")


@_fn("lowercase")
def _fc_lower(args, node, ctx):
    return TypedCol(F.lower(as_string(args[0])), "string")


@_fn("trim")
def _fc_trim(args, node, ctx):
    # JSONata $trim collapses internal whitespace runs to one space
    return TypedCol(
        F.trim(F.regexp_replace(as_string(args[0]), r"\s+", " ")), "string"
    )


@_fn("length")
def _fc_length(args, node, ctx):
    return TypedCol(F.length(as_string(args[0])).cast("double"), "number")


@_fn("substring")
def _fc_substring(args, node, ctx):
    s = as_string(args[0])
    start = as_number(args[1]).cast("int")
    # JS 0-based; negative counts from end; Spark substring is 1-based
    pos = F.when(start < 0, F.greatest(F.length(s) + start, F.lit(0)) + 1) \
        .otherwise(start + 1)
    if len(args) >= 3:
        ln = as_number(args[2]).cast("int")
        return TypedCol(s.substr(pos, ln), "string")
    return TypedCol(s.substr(pos, F.length(s)), "string")


@_fn("substringBefore")
def _fc_substr_before(args, node, ctx):
    s, sep = as_string(args[0]), as_string(args[1])
    idx = F.instr(s, sep)
    return TypedCol(F.when(idx > 0, s.substr(F.lit(1), idx - 1)).otherwise(s),
                    "string")


@_fn("substringAfter")
def _fc_substr_after(args, node, ctx):
    s, sep = as_string(args[0]), as_string(args[1])
    idx = F.instr(s, sep)
    return TypedCol(
        F.when(idx > 0, s.substr(idx + F.length(sep), F.length(s)))
        .otherwise(s),
        "string",
    )


@_fn("pad")
def _fc_pad(args, node, ctx):
    s = as_string(args[0])
    width = as_number(args[1]).cast("int")
    char = as_string(args[2]) if len(args) >= 3 else F.lit(" ")
    return TypedCol(
        F.when(width >= 0, F.rpad(s, F.greatest(width, F.length(s)), char))
        .otherwise(F.lpad(s, F.greatest(-width, F.length(s)), char)),
        "string",
    )


@_fn("contains")
def _fc_contains(args, node, ctx):
    s = as_string(args[0])
    rx = _arg_regex(node["args"], 1)
    if rx is not None:
        return TypedCol(s.rlike(rx), "boolean")
    return TypedCol(F.contains(s, as_string(args[1])), "boolean")


@_fn("split")
def _fc_split(args, node, ctx):
    s = as_string(args[0])
    rx = _arg_regex(node["args"], 1)
    if rx is None:
        if node["args"][1]["type"] != "string":
            raise NotCompilable("$split separator must be literal (v0)")
        rx = _re.escape(node["args"][1]["value"])
    limit = F.lit(-1) if len(args) < 3 else as_number(args[2]).cast("int")
    col = F.split(s, rx)
    if len(args) >= 3:
        col = F.slice(col, 1, limit)
    return TypedCol(col, "array<string>", elem="string")


@_fn("join")
def _fc_join(args, node, ctx):
    arr = _as_array(args[0], "string")
    if len(args) >= 2:
        sep_node = node["args"][1]
        if sep_node["type"] != "string":
            raise NotCompilable("$join separator must be literal (v0)")
        sep = sep_node["value"]
    else:
        sep = ""
    return TypedCol(F.array_join(arr, sep), "string")


def _js_repl_to_java(template: str, n_groups: int) -> str:
    """Translate a JS/JSONata $replace template to Java replacement
    syntax (r7 regex-fidelity audit). JS: ``$$`` is a literal $, ``$N``
    (longest 1-2 digit run <= group count) is a group ref, any other
    ``$`` is LITERAL. Java regexp_replace THROWS on a group ref beyond
    the pattern's group count and treats bare ``$``/``\\`` as syntax —
    one bad row would kill a vectorized batch, so every non-ref ``$``
    and every backslash is escaped here at compile time."""
    out = []
    i = 0
    while i < len(template):
        ch = template[i]
        if ch == "\\":
            out.append("\\\\")
            i += 1
            continue
        if ch == "$" and i + 1 < len(template) and template[i + 1] == "$":
            out.append("\\$")
            i += 2
            continue
        if ch == "$":
            j = i + 1
            num = ""
            while j < len(template) and template[j].isdigit() \
                    and len(num) < 2:
                cand = num + template[j]
                if int(cand) <= n_groups:
                    num = cand
                    j += 1
                else:
                    break
            if num:
                out.append(f"${num}")
                i = j
                continue
            out.append("\\$")
            i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)


@_fn("replace")
def _fc_replace(args, node, ctx):
    s = as_string(args[0])
    rx = _arg_regex(node["args"], 1)
    if rx is not None:
        if len(args) >= 4:
            raise NotCompilable("$replace with limit needs interpreter")
        if node["args"][2]["type"] != "string":
            # dynamic replacement: $-refs can't be validated statically
            # and Java throws on refs beyond the group count
            raise NotCompilable(
                "$replace with a regex needs a literal replacement")
        import re as _re_mod

        try:
            n_groups = _re_mod.compile(
                node["args"][1]["pattern"]).groups
        except _re_mod.error:
            raise NotCompilable(
                "$replace pattern not statically analyzable")
        repl = _js_repl_to_java(node["args"][2]["value"], n_groups)
        return TypedCol(F.regexp_replace(s, rx, F.lit(repl)), "string")
    if node["args"][1]["type"] != "string":
        raise NotCompilable("$replace pattern must be literal (v0)")
    if len(args) >= 4:
        raise NotCompilable("$replace with limit needs interpreter")
    repl = as_string(args[2])
    return TypedCol(F.replace(s, as_string(args[1]), repl), "string")


@_fn("match")
def _fc_match(args, node, ctx):
    """$match(str, /regex/[, limit]) compiled to native Columns —
    previously interpreter-only (round-4 verdict gap #2). Matches and
    per-group strings come from regexp_extract_all; the JS ``m.start()``
    offsets come from SPLIT-SEGMENT accounting (r7, replacing the r4
    position()-search walk): ``split(s, rx, -1)`` yields exactly the
    inter-match segments of the same left-to-right non-overlapping scan
    the extraction performs, so ``index(m_k) = Σ_{j<=k} len(seg_j) +
    Σ_{j<k} len(m_j)`` — sound for ANCHORED and ``\\b`` patterns too
    (the r4 walk searched for the matched TEXT, which an anchor-gated
    match can't locate). Still interpreter-only: lookaround (zero-width
    context the segment accounting cannot see), patterns that can match
    the EMPTY string (Java split drops/merges zero-width boundaries),
    and non-literal patterns (the group count must be static).

    Returns ``array<struct<match, index, groups>>`` — the same
    match-object list the interpreter builds (interpreter.py _f_match),
    with non-participating groups as '' on both backends; that list shape
    is cardinality-independent, so whole-value serialization, $count, and
    indexed access stay parity-exact. NAME navigation over the result
    (``$match(...).match``) needs JSONata's singleton-collapse and is
    marked seq_nav_unsafe — it raises NotCompilable so the expression
    falls back to the interpreter instead of silently returning [x]
    where the reference gives x."""
    import pyspark.sql.types as T

    s = as_string(args[0])
    rx = _arg_regex(node["args"], 1)
    if rx is None:
        raise NotCompilable("$match needs a regex literal")
    # both guards run on the RAW source pattern: the r8 fidelity rewrite
    # (_js_regex_to_java) expands \b/\B into lookaround GROUPS that are
    # semantically boundary assertions — exactly the zero-width class the
    # segment accounting below already handles for \b — so only USER
    # lookarounds (visible in the source) force the interpreter, and the
    # zero-width probe keeps stripping \b atoms instead of trying to
    # analyze the expanded groups
    raw = node["args"][1]["pattern"]
    if _LOOKAROUND.search(raw):
        raise NotCompilable("$match with lookaround needs the interpreter")
    try:
        if _re.search(_ANCHORS.sub("", raw), "") is not None:
            # pattern can match zero-length (anchor/\b atoms stripped for
            # the probe — they assert positions, never consume)
            raise NotCompilable(
                "$match with a zero-width-capable pattern needs the "
                "interpreter")
    except _re.error:
        raise NotCompilable("$match pattern not statically analyzable")
    n_groups = _count_capture_groups(rx)
    matches_all = F.regexp_extract_all(s, F.lit(rx), 0)
    matches = matches_all
    if len(args) >= 3:
        matches = F.slice(matches_all, 1, as_number(args[2]).cast("int"))
    groups = [F.regexp_extract_all(s, F.lit(rx), g + 1)
              for g in range(n_groups)]

    seg_lens = F.transform(F.split(s, rx, -1), lambda x: F.length(x))
    m_lens = F.transform(matches_all, lambda x: F.length(x))

    def _cum(arr: Column, n: Column) -> Column:
        return F.aggregate(F.slice(arr, F.lit(1), n), F.lit(0),
                           lambda a, x: a + x)

    idxs = F.transform(
        matches_all,
        lambda m, i: (_cum(seg_lens, i + 1) + _cum(m_lens, i))
        .cast("double"),
    )
    group_col = (
        (lambda i: F.array(*[F.get(g, i) for g in groups])) if groups
        else (lambda i: F.array().cast("array<string>"))
    )
    structs = F.transform(
        matches,
        lambda m, i: F.struct(
            m.alias("match"),
            F.get(idxs, i).alias("index"),
            group_col(i).alias("groups"),
        ),
    )
    dt = T.StructType([
        T.StructField("match", T.StringType()),
        T.StructField("index", T.DoubleType()),
        T.StructField("groups", T.ArrayType(T.StringType())),
    ])
    return TypedCol(structs, "array<object>", elem="object", dtype=dt,
                    seq_nav_unsafe=True)


@_fn("base64encode")
def _fc_b64e(args, node, ctx):
    return TypedCol(F.base64(as_string(args[0]).cast("binary")), "string")


@_fn("base64decode")
def _fc_b64d(args, node, ctx):
    return TypedCol(F.unbase64(as_string(args[0])).cast("string"), "string")


@_fn("abs")
def _fc_abs(args, node, ctx):
    return TypedCol(F.abs(as_number(args[0])), "number")


@_fn("floor")
def _fc_floor(args, node, ctx):
    return TypedCol(F.floor(as_number(args[0])).cast("double"), "number")


@_fn("ceil")
def _fc_ceil(args, node, ctx):
    return TypedCol(F.ceil(as_number(args[0])).cast("double"), "number")


@_fn("round")
def _fc_round(args, node, ctx):
    v = as_number(args[0])
    p = as_number(args[1]).cast("int") if len(args) >= 2 else F.lit(0)
    return TypedCol(F.bround(v, p), "number")  # banker's rounding, like $round


@_fn("power")
def _fc_power(args, node, ctx):
    return TypedCol(F.pow(as_number(args[0]), as_number(args[1])), "number")


@_fn("sqrt")
def _fc_sqrt(args, node, ctx):
    return TypedCol(F.sqrt(as_number(args[0])), "number")


@_fn("random")
def _fc_random(args, node, ctx):
    return TypedCol(F.rand(), "number")


@_fn("formatBase")
def _fc_format_base(args, node, ctx):
    v = as_number(args[0]).cast("long")
    if len(args) >= 2:
        radix_node = node["args"][1]
        if radix_node["type"] != "number":
            raise NotCompilable("$formatBase radix must be literal")
        radix = int(radix_node["value"])
    else:
        radix = 10
    return TypedCol(F.lower(F.conv(v.cast("string"), 10, radix)), "string")


@_fn("formatNumber")
def _fc_format_number(args, node, ctx):
    """Compiled $formatNumber for the interpreter's supported picture
    subset (grouping ',' + '0'/'#' decimal places; interpreter.py
    _f_format_number). The picture must be a literal — run-time pictures
    fall back to the interpreter. Ties are resolved with bround
    (banker's/HALF_EVEN) BEFORE formatting, matching Python's %.Nf
    half-even behavior on exactly-representable halves."""
    from mqtt_streamr_spark.jsonata.interpreter import parse_number_picture

    v = as_number(args[0])
    if len(node["args"]) < 2 or node["args"][1]["type"] != "string":
        raise NotCompilable("$formatNumber picture must be a literal string")
    picture = node["args"][1]["value"]
    try:
        prefix, suffix, grouped, decimals, min_int, scale = \
            parse_number_picture(picture)
    except ValueError as exc:
        raise NotCompilable(str(exc)) from exc
    if grouped and min_int > 1:
        # zero-padding through grouping separators: interpreter-only
        raise NotCompilable("grouped zero-padded $formatNumber picture")
    rounded = F.bround(v * scale if scale != 1 else v, decimals)
    if grouped:
        out = F.format_number(rounded, decimals)
    else:
        out = F.format_string(f"%.{decimals}f", rounded)
        if min_int > 1:
            # zero-pad the integer digits to min_int, preserving the sign
            # (mirrors the interpreter's padding; lpad alone would
            # TRUNCATE longer values, hence the length guard)
            neg = F.substring(out, 1, 1) == "-"
            body = F.when(neg, F.substr(out, F.lit(2), F.length(out))) \
                .otherwise(out)
            int_part = F.when(
                F.instr(body, ".") > 0,
                F.substr(body, F.lit(1), F.instr(body, ".") - 1),
            ).otherwise(body)
            frac_part = F.when(
                F.instr(body, ".") > 0,
                F.substr(body, F.instr(body, "."), F.length(body)),
            ).otherwise(F.lit(""))
            padded = F.when(
                F.length(int_part) < min_int,
                F.lpad(int_part, min_int, "0"),
            ).otherwise(int_part)
            out = F.concat(
                F.when(neg, F.lit("-")).otherwise(F.lit("")),
                padded, frac_part,
            )
    if prefix or suffix:
        out = F.concat(F.lit(prefix), out, F.lit(suffix))
    return TypedCol(out, "string")


@_fn("sum")
def _fc_sum(args, node, ctx):
    arr = _as_array(args[0], "double")
    return TypedCol(
        F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x), "number"
    )


@_fn("max")
def _fc_max(args, node, ctx):
    return TypedCol(F.array_max(_as_array(args[0], "double")), "number")


@_fn("min")
def _fc_min(args, node, ctx):
    return TypedCol(F.array_min(_as_array(args[0], "double")), "number")


@_fn("average")
def _fc_average(args, node, ctx):
    arr = _as_array(args[0], "double")
    total = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
    return TypedCol(total / F.size(arr), "number")


@_fn("count")
def _fc_count(args, node, ctx):
    tc = args[0]
    if tc.kind.startswith("array"):
        # NULL array = undefined sequence: $count(undefined) is 0 (and
        # guards against size()'s legacy -1-for-NULL behavior)
        return TypedCol(
            F.when(tc.col.isNotNull(), F.size(tc.col).cast("double"))
            .otherwise(F.lit(0.0)),
            "number",
        )
    if tc.kind == "variant":
        arr = F.try_variant_get(tc.col, "$", "array<variant>")
        return TypedCol(
            F.when(tc.col.isNull(), F.lit(0.0))
            .when(arr.isNotNull(), F.size(arr).cast("double"))
            .otherwise(F.lit(1.0)),
            "number",
        )
    return TypedCol(F.when(tc.col.isNull(), 0.0).otherwise(1.0), "number")


def _append_items(t: TypedCol) -> Column:
    """The item list an $append argument contributes: a variant holding
    an array contributes its elements, any other present variant value
    (including JSON null — a VALUE) contributes itself as a singleton;
    typed arrays contribute their elements re-encoded as variants."""
    if t.kind == "variant":
        return F.when(
            t.col.isNotNull(),
            F.coalesce(
                F.try_variant_get(t.col, "$", "array<variant>"),
                F.array(t.col),
            ),
        )
    if (t.elem or "variant") == "variant":
        return t.col
    elem, dt = t.elem, t.dtype
    return F.transform(
        t.col,
        lambda x: F.parse_json(to_json_string(_elem_tc(x, elem, dt))),
    )


@_fn("append")
def _fc_append(args, node, ctx):
    a, b = args
    orig_a, orig_b = a, b
    arrayish = all(
        t.kind == "variant" or t.kind.startswith("array") for t in (a, b)
    )
    if not arrayish:
        if all(t.kind in ("number", "string", "boolean", "null", "variant")
               or t.kind.startswith("array") for t in (a, b)):
            # scalar arg(s): wrap as a singleton array value (JSONata
            # $append(3, 9) = [3, 9]) for the CONCAT case; the undefined
            # pass-through below uses the ORIGINAL arg's as-is form
            # ($append(missing, 42) is 42, not [42])
            def enc(t: TypedCol) -> TypedCol:
                if t.kind in ("number", "string", "boolean", "null"):
                    return TypedCol(
                        F.when(t.col.isNotNull(),
                               F.array(F.parse_json(to_json_string(t)))),
                        "array<variant>", elem="variant")
                return t

            a, b = enc(a), enc(b)
        else:
            raise NotCompilable("$append needs compiled array/scalar args")
    if a.kind.startswith("array") and b.kind.startswith("array") \
            and a.elem == b.elem and not a.is_seq and not b.is_seq \
            and a.kind != "array<variant>":
        # two typed array VALUES: plain concat; $append(undefined, x) ->
        # x as-is and vice versa; both undefined -> undefined. The result
        # is an array VALUE, never boundary-unwrapped ($append([0],
        # undefined) is [0], not 0 — r7 fuzzer find). Both args are
        # _let-bound — the emission references each 3 times and nested
        # $append would compound the copies exponentially.
        col = _let(a.col, lambda ac: _let(b.col, lambda bc: F.when(
            ac.isNotNull() | bc.isNotNull(),
            F.concat(F.coalesce(ac, F.slice(bc, 1, 0)),
                     F.coalesce(bc, F.slice(ac, 1, 0))),
        )))
        return TypedCol(col, a.kind, elem=a.elem)
    # general form (r7): SEQUENCE args arrive post-boundary in the
    # interpreter (singleton -> its item, empty -> undefined), so the
    # undefined pass-through returns the OTHER arg in its post-boundary
    # form — a scalar when it was a singleton sequence, the array itself
    # when it was an array value. One static type can hold both: VARIANT
    # (r7 fuzzer find; the old emission tagged the result is_seq, which
    # wrongly unwrapped $append(value-[0], empty)). Variant args (the
    # schemaless path) ride the same emission.
    a_j = to_json_string(orig_a)
    b_j = to_json_string(orig_b)
    both = F.to_json(F.concat(_append_items(a), _append_items(b)),
                     {"ignoreNullFields": "false"})
    # NOT _let-bound: a_j/b_j are referenced 3x, but _let adds a LAMBDA
    # level and nested $append chains then blow the analyzer's
    # lambda-resolution iteration budget (fuzzer-found at 3 deep) —
    # chained appends pass variants through, whose as-is form is a tiny
    # cast, so duplication is the cheaper dimension here
    col = (
        F.when(a_j.isNull() & b_j.isNull(), F.lit(None).cast("string"))
        .when(a_j.isNull(), b_j)
        .when(b_j.isNull(), a_j)
        .otherwise(both)
    )
    return TypedCol(F.parse_json(col), "variant")


@_fn("reverse")
def _fc_reverse(args, node, ctx):
    t = args[0]
    if t.kind == "variant":
        # r7: variant arg — array reverses, a scalar is the singleton
        # [v] ($reverse(5) = [5]), undefined stays undefined
        return TypedCol(F.reverse(_as_array(t, "variant")),
                        "array<variant>", elem="variant")
    if not t.kind.startswith("array"):
        raise NotCompilable("$reverse needs a compiled array")
    return TypedCol(F.reverse(t.col), t.kind, elem=t.elem)


# --- higher-order functions (§2.6 array HOFs -> transform/filter/aggregate) --

@_fn("map")
def _fc_map(args, node, ctx):
    lam = _lambda_arg(node, 1, 2, "$map")
    arr, elem, elem_dt = _hof_array(args[0])
    out: list[TypedCol] = []

    def body(*cols: Column) -> Column:
        binds = [_elem_tc(cols[0], elem, elem_dt)]
        if len(cols) == 2:
            binds.append(TypedCol(cols[1].cast("double"), "number"))
        tc = _bind_lambda(lam, binds, ctx)
        out.append(tc)
        return tc.col

    if len(lam["params"]) == 1:
        col = F.transform(arr, lambda x: body(x))
    else:
        col = F.transform(arr, lambda x, i: body(x, i))
    return TypedCol(col, f"array<{out[0].kind}>", elem=out[0].kind,
                    dtype=out[0].dtype, is_seq=True)


@_fn("filter")
def _fc_filter(args, node, ctx):
    lam = _lambda_arg(node, 1, 2, "$filter")
    arr, elem, elem_dt = _hof_array(args[0])

    def body(*cols: Column) -> Column:
        binds = [_elem_tc(cols[0], elem, elem_dt)]
        if len(cols) == 2:
            binds.append(TypedCol(cols[1].cast("double"), "number"))
        return as_boolean(_bind_lambda(lam, binds, ctx))

    if len(lam["params"]) == 1:
        col = F.filter(arr, lambda x: body(x))
    else:
        col = F.filter(arr, lambda x, i: body(x, i))
    return TypedCol(col, f"array<{elem}>", elem=elem, dtype=elem_dt,
                    is_seq=True)


@_fn("reduce")
def _fc_reduce(args, node, ctx):
    """$reduce(arr, fn[, init]) -> aggregate(). Without init, JSONata seeds
    with the first element and folds the rest."""
    lam = _lambda_arg(node, 1, 2, "$reduce")
    if len(lam["params"]) != 2:
        raise NotCompilable("$reduce lambda must take ($acc, $v)")
    arr, elem, elem_dt = _hof_array(args[0])
    if len(args) >= 3:
        init = args[2]
        if init.kind == "variant":
            init = TypedCol(as_number(init), "number")
        rest = arr
    else:
        first = _elem_tc(F.element_at(arr, 1), elem, elem_dt)
        if elem == "variant":
            # seed kind = the lambda's own stable result kind: probe the
            # body with a number accumulator first (the common arithmetic
            # fold), then string ($a & $b string folds previously seeded
            # as_number(first) = NULL and silently nulled the whole fold)
            init = None
            for kind, coerce in (("number", as_number), ("string", as_string)):
                try:
                    body = _bind_lambda(
                        lam,
                        [TypedCol(F.lit(None).cast(
                            "double" if kind == "number" else "string"),
                            kind), first],
                        ctx)
                except NotCompilable:
                    continue
                if body.kind == kind:
                    init = TypedCol(coerce(first), kind)
                    break
            if init is None:
                raise NotCompilable(
                    "$reduce seed kind not statically stable")
        else:
            init = first
        rest = F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0)))
    acc_kind = init.kind

    def merge(acc: Column, x: Column) -> Column:
        tc = _bind_lambda(
            lam, [TypedCol(acc, acc_kind), _elem_tc(x, elem, elem_dt)], ctx
        )
        if tc.kind == acc_kind:
            return tc.col
        if acc_kind == "number":
            return as_number(tc)
        if acc_kind == "string":
            return as_string(tc)
        raise NotCompilable(
            f"$reduce body kind {tc.kind} != accumulator {acc_kind}"
        )

    return TypedCol(F.aggregate(rest, init.col, merge), acc_kind)


def _dyn_compare(le: Column, r: Column) -> Column:
    """-1/0/1 comparator for variant elements: numeric when both sides are
    numeric, else string — the dynamic dispatch JSONata's sort does."""
    ln = F.try_variant_get(le, "$", "double")
    rn = F.try_variant_get(r, "$", "double")
    ls = F.try_variant_get(le, "$", "string")
    rs = F.try_variant_get(r, "$", "string")
    num = F.when(ln < rn, -1).when(ln > rn, 1).otherwise(0)
    s = F.when(ls < rs, -1).when(ls > rs, 1).otherwise(0)
    return F.when(ln.isNotNull() & rn.isNotNull(), num).otherwise(s)


@_fn("sort")
def _fc_sort(args, node, ctx):
    """$sort(arr[, fn]) — fn($a,$b) returns true when a sorts AFTER b
    (JSONata swap contract), mapped to a ±1 comparator."""
    arr, elem, elem_dt = _hof_array(args[0])
    if len(node["args"]) == 1:
        if elem in ("number", "string"):
            return TypedCol(F.sort_array(arr), f"array<{elem}>", elem=elem)
        return TypedCol(
            F.array_sort(arr, _dyn_compare), f"array<{elem}>", elem=elem
        )
    lam = _lambda_arg(node, 1, 2, "$sort")
    if len(lam["params"]) != 2:
        raise NotCompilable("$sort comparator must take ($a, $b)")

    def comp_with(kind: str):
        def comp(a: Column, b: Column) -> Column:
            ta = _elem_tc(a, elem, elem_dt) if elem != "variant" \
                else TypedCol(
                F.try_variant_get(a, "$", "double" if kind == "number"
                                  else "string"), kind)
            tb = _elem_tc(b, elem, elem_dt) if elem != "variant" \
                else TypedCol(
                F.try_variant_get(b, "$", "double" if kind == "number"
                                  else "string"), kind)
            swap = as_boolean(_bind_lambda(lam, [ta, tb], ctx))
            return F.when(swap, F.lit(1)).otherwise(F.lit(-1))

        return comp

    # variant elements: compile the comparator with numeric bindings first
    # (the common case); if the body needs strings, retry with strings
    try:
        col = F.array_sort(arr, comp_with("number"))
    except NotCompilable:
        col = F.array_sort(arr, comp_with("string"))
    return TypedCol(col, f"array<{elem}>", elem=elem)


@_fn("zip")
def _fc_zip(args, node, ctx):
    """$zip(a, b) -> array of [a[i], b[i]] pairs, truncated to the shorter
    input (JSONata truncates; Spark's zip_with pads with null, so both
    sides are sliced to the common length first)."""
    if len(args) != 2:
        raise NotCompilable("$zip compiles for exactly 2 arrays")
    a, ae, _adt = _hof_array(args[0])
    b, be, _bdt = _hof_array(args[1])
    if ae != be:
        raise NotCompilable("$zip needs same-kind arrays")
    n = F.least(F.size(a), F.size(b))
    col = F.zip_with(
        F.slice(a, 1, n), F.slice(b, 1, n), lambda x, y: F.array(x, y)
    )
    return TypedCol(col, f"array<array<{ae}>>", elem=f"array<{ae}>")


# $keys on the VARIANT path compiles via the RAW JSON string (r6): the
# variant encoding stores object keys sorted, but json_object_keys over
# the original payload text preserves insertion order. Requires the raw
# column (compile_column raw_col=...) and a literal-path argument;
# everything else still falls back to the interpreter. On the TYPED path
# the declared schema order IS the insertion order, so it compiles too.

@_fn("keys")
def _fc_keys(args, node, ctx):
    """$keys(obj): field names in source/declaration order.

    TYPED path: statically-known fields; a NULL-valued field reads as
    absent (the typed path cannot distinguish JSON null from a missing
    key — same documented divergence as $exists). VARIANT path: keys
    read from the raw payload text in insertion order; arrays merge
    member-object keys in first-appearance order (JSONata's recursive
    $keys-over-array rule) and arrays of non-objects yield [], both
    matching the interpreter; scalars yield undefined."""
    obj = args[0]
    if obj.kind == "omap":  # $sift/$merge output composes directly
        return TypedCol(F.map_keys(obj.col), "array<string>",
                        elem="string")
    if obj.kind == "variant":
        raw = _raw_json_str(node["args"][0], ctx, variant_col=obj.col,
                            allow=("OBJECT", "ARRAY"))
        arr_keys = F.array_distinct(F.flatten(F.filter(
            F.transform(
                F.from_json(raw, "array<map<string, variant>>"),
                lambda m: F.map_keys(m),
            ),
            lambda ks: ks.isNotNull(),
        )))
        col = F.when(
            F.schema_of_variant(obj.col).startswith("ARRAY"),
            F.coalesce(arr_keys, F.array().cast("array<string>")),
        ).otherwise(F.json_object_keys(raw))
        return TypedCol(col, "array<string>", elem="string")
    if obj.kind != "object":
        raise NotCompilable("$keys compiles for typed/variant objects only")
    if obj.dtype is not None:
        names = list(obj.dtype.fieldNames())
    elif obj.fields is not None:
        names = list(obj.fields)
    else:
        raise NotCompilable("$keys needs statically-known fields")
    tagged = F.array(*[
        F.when(obj.col.getField(n).isNotNull(), F.lit(n)) for n in names
    ])
    col = F.filter(tagged, lambda x: x.isNotNull())
    return TypedCol(col, "array<string>", elem="string")


@_fn("spread")
def _fc_spread(args, node, ctx):
    """$spread(obj) on the VARIANT path: array of single-key objects in
    source key order, built from the raw payload text via an ordered
    map (the variant binary would sort the keys). Typed/constructed
    objects stay on the interpreter (their single-pair objects have
    per-field value types a uniform Spark array cannot hold).
    Divergence (documented): the interpreter passes non-object arguments
    through unchanged (scalars as-is, arrays member-wise) — a per-row
    output-type dispatch a static Column cannot express — so the
    compiled path yields undefined for runtime non-objects (the
    type-guard in _raw_json_str)."""
    obj = args[0]
    if obj.kind == "omap":
        m = obj.col
    elif obj.kind == "variant":
        m = _ordered_map(node["args"][0], ctx, variant_col=obj.col)
    else:
        raise NotCompilable("$spread compiles for variant/omap objects")
    col = F.transform(
        F.map_entries(m),
        lambda e: F.map_from_entries(F.array(e)),
    )
    return TypedCol(col, "array<omap>", elem="omap")


@_fn("now")
def _fc_now(args, node, ctx):
    """ISO-8601 UTC timestamp string (JSONata $now)."""
    return TypedCol(
        F.date_format(
            F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
        ),
        "string",
    )


@_fn("millis")
def _fc_millis(args, node, ctx):
    return TypedCol(
        F.unix_millis(F.current_timestamp()).cast("double"), "number"
    )


@_fn("merge")
def _fc_merge(args, node, ctx):
    """$merge([o1, o2, ...]).

    VARIANT path (r6): items that are literal paths merge as ordered
    maps — later values override earlier ones IN PLACE (first-appearance
    key position, the JS object-spread rule the interpreter follows),
    using the JSON-null-vs-missing distinction the map encoding keeps
    (a json null is a non-SQL-null variant, so coalesce-override is
    exact). A runtime non-object item contributes nothing (type-error →
    undefined, the compiled path's documented divergence class).
    Otherwise: statically-constructed objects merge at compile time
    (struct field merge)."""
    arr_node = node["args"][0] if node["args"] else None
    if arr_node is None or arr_node["type"] != "array":
        raise NotCompilable("$merge compiles for literal object arrays")
    empty = F.from_json(F.lit("{}"), "map<string, variant>")

    def item_map(it) -> Column:
        tc = _compile(it, ctx)
        if tc.kind == "omap":  # composed $sift/$merge output
            return tc.col
        return _ordered_map(it, ctx, variant_col=tc.col)

    try:
        maps = [F.coalesce(item_map(it), empty) for it in arr_node["items"]]
    except NotCompilable:
        maps = None
    if maps is not None:
        def fold(acc: Column, nxt: Column) -> Column:
            # acc/nxt are HOF lambda vars (bound ONCE per row by the
            # zip_with below) — building the fold on the raw map
            # expressions instead re-parses each map's JSON 2-3x per row
            # (measured ~2.5x slower on the object-ops bench query)
            overridden = F.transform(
                F.map_entries(acc),
                lambda e: F.struct(
                    e.getField("key").alias("key"),
                    F.coalesce(
                        F.element_at(nxt, e.getField("key")),
                        e.getField("value"),
                    ).alias("value"),
                ),
            )
            fresh = F.filter(
                F.map_entries(nxt),
                lambda e: ~F.array_contains(
                    F.map_keys(acc), e.getField("key")
                ),
            )
            return F.map_from_entries(F.concat(overridden, fresh))

        merged_m = maps[0] if maps else empty
        for nxt_m in maps[1:]:
            merged_m = F.element_at(
                F.zip_with(F.array(merged_m), F.array(nxt_m), fold), 1
            )
        return TypedCol(merged_m, "omap")
    merged: dict[str, Column] = {}
    for item in arr_node["items"]:
        tc = _compile(item, ctx)
        if tc.kind != "object" or tc.fields is None:
            raise NotCompilable(
                "$merge items must be statically-constructed objects"
            )
        for f_name in tc.fields:
            merged[f_name] = tc.col.getField(f_name)
    return TypedCol(
        F.struct(*[c.alias(n) for n, c in merged.items()]), "object",
        fields=list(merged),
    )


@_fn("each")
def _fc_each(args, node, ctx):
    """$each(obj, fn($v, $k)): array of per-entry lambda results.

    TYPED path: the object's fields are statically known, so the
    iteration expands at compile time into an array of per-field
    results. VARIANT path (r6): iterate an ordered map built from the
    raw payload text — one ``transform`` over ``map_entries``, values
    bound as variants, keys as strings, source key order preserved."""
    lam = _lambda_arg(node, 1, 2, "$each")
    obj = args[0]
    if obj.kind in ("variant", "omap"):
        m = (obj.col if obj.kind == "omap"
             else _ordered_map(node["args"][0], ctx, variant_col=obj.col))
        out: dict = {}

        def body(e: Column) -> Column:
            binds = [TypedCol(e.getField("value"), "variant")]
            if len(lam["params"]) == 2:
                binds.append(TypedCol(e.getField("key"), "string"))
            tc = _bind_lambda(lam, binds, ctx)
            out["kind"] = tc.kind
            return tc.col

        col = F.transform(F.map_entries(m), body)
        kind = out["kind"]
        if kind.startswith("array") or kind in ("object", "omap"):
            raise NotCompilable(
                "$each body producing nested arrays/objects on the "
                "variant path (flatten semantics) stays interpreted"
            )
        return TypedCol(col, f"array<{kind}>", elem=kind, is_seq=True)
    if obj.kind != "object" or obj.dtype is None:
        raise NotCompilable("$each compiles for typed objects only")
    items: list[Column] = []
    out_kind: str | None = None
    for fname in obj.dtype.fieldNames():
        v = _typed_from(obj.col.getField(fname), obj.dtype[fname].dataType)
        binds = [v]
        if len(lam["params"]) == 2:
            binds.append(TypedCol(F.lit(fname), "string"))
        tc = _bind_lambda(lam, binds, ctx)
        if out_kind is None:
            out_kind = tc.kind
        elif tc.kind != out_kind:
            raise NotCompilable(
                f"$each body kinds differ across fields "
                f"({out_kind} vs {tc.kind})"
            )
        items.append(tc.col)
    if not items:
        return TypedCol(F.array(), "array<string>", elem="string",
                        is_seq=True)
    return TypedCol(F.array(*items), f"array<{out_kind}>", elem=out_kind,
                    is_seq=True)


@_fn("sift")
def _fc_sift(args, node, ctx):
    """$sift(obj, fn($v, $k)) on the TYPED path: fields failing the
    predicate become NULL in the output struct — JSON serialization drops
    them (ignoreNullFields), matching JSONata's key-dropping. Divergence:
    a field whose real value IS null is indistinguishable from a sifted
    one (documented null/undefined conflation of the compiled path)."""
    lam = _lambda_arg(node, 1, 2, "$sift")
    obj = args[0]
    if obj.kind in ("variant", "omap"):
        # VARIANT path (r6): map_filter over the ordered map from the raw
        # payload text — entries whose predicate fails are REMOVED (true
        # key-dropping, no null conflation), source key order preserved;
        # omap inputs ($sift/$merge outputs) compose directly
        m = (obj.col if obj.kind == "omap"
             else _ordered_map(node["args"][0], ctx, variant_col=obj.col))

        def pred(k: Column, v: Column) -> Column:
            binds = [TypedCol(v, "variant")]
            if len(lam["params"]) == 2:
                binds.append(TypedCol(k, "string"))
            keep = as_boolean(_bind_lambda(lam, binds, ctx))
            return F.coalesce(keep, F.lit(False))

        return TypedCol(F.map_filter(m, pred), "omap")
    if obj.kind != "object" or obj.dtype is None:
        raise NotCompilable("$sift compiles for typed/variant objects")
    fields: list[Column] = []
    names: list[str] = []
    for fname in obj.dtype.fieldNames():
        v = _typed_from(obj.col.getField(fname), obj.dtype[fname].dataType)
        binds = [v]
        if len(lam["params"]) == 2:
            binds.append(TypedCol(F.lit(fname), "string"))
        keep = as_boolean(_bind_lambda(lam, binds, ctx))
        fields.append(F.when(keep, v.col).alias(fname))
        names.append(fname)
    return TypedCol(F.struct(*fields), "object", fields=names,
                    dtype=obj.dtype)


@_fn("lookup")
def _fc_lookup(args, node, ctx):
    """$lookup(obj, key). Literal key -> variant path extraction (or
    typed struct navigation). DYNAMIC key (r6): variant_get paths must
    be foldable, so a computed key reads through the ordered-map
    encoding instead — element_at(map<string,variant>, key) — which
    needs the raw column + a literal-path object argument. Divergence
    (documented, same class as $keys): a runtime ARRAY of objects maps
    $lookup over members in the interpreter; here it yields undefined."""
    key_node = node["args"][1] if len(node["args"]) > 1 else None
    if key_node is None:
        raise NotCompilable("$lookup needs two args")
    obj = args[0]
    if obj.kind == "omap":  # composed $sift/$merge output: direct access
        key = (F.lit(key_node["value"]) if key_node["type"] == "string"
               else as_string(args[1]))
        return TypedCol(F.element_at(obj.col, key), "variant")
    if key_node["type"] != "string":
        if obj.kind != "variant":
            raise NotCompilable("dynamic $lookup needs a variant object")
        key = as_string(args[1])
        m = _ordered_map(node["args"][0], ctx, variant_col=obj.col)
        return TypedCol(F.element_at(m, key), "variant")
    if obj.kind == "object" and obj.dtype is not None:
        return _typed_navigate(obj.col, obj.dtype, [key_node["value"]])
    if obj.kind != "variant":
        raise NotCompilable("$lookup compiles for variant objects")
    return TypedCol(
        F.try_variant_get(obj.col, _json_path([key_node["value"]]), "variant"),
        "variant",
    )
