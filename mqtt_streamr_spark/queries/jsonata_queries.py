"""JSONata-transform queries: the reference's --transform path
(bin/mqtt-streamr.js:48-51,108,157-159) exercised end-to-end on the events
table via the COMPILED Column backend, hash-checked against DuckDB SQL that
re-states the same transform relationally.

The payload is built exactly like the streaming pipeline does: the events row
serialized to JSON, parsed with try_parse_json, transformed by a compiled
JSONata expression — all inside whole-stage codegen (no Python at run time).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import col

from mqtt_streamr_spark.jsonata.compiler import compile_column
from mqtt_streamr_spark.queries.registry import query
from mqtt_streamr_spark.tables import load


def _payload_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events rows as JSON message payloads (the replay-source contract,
    FIXTURES.md §1.1), parsed to a variant column."""
    ev = load(spark, "events", sf_dir)
    return ev.withColumn(
        "payload",
        F.to_json(F.struct("event_id", "user_id", "event_type", "value", "props")),
    ).withColumn("v", F.try_parse_json("payload"))


_TRANSFORM = """
{
  "u": user_id,
  "kind": $uppercase(event_type),
  "v2": value * 2,
  "tier": value > 50 ? 'high' : 'low',
  "ok": (value > 10 or value < 2) and $exists(props) and $not(user_id % 3 = 0),
  "k": $number($substringAfter($substringBefore(props, '}'), ': '))
}
"""


@query(
    "jsonata_transform_compiled",
    oracle="""
    WITH msg AS (
        SELECT user_id AS u,
               upper(event_type) AS kind,
               value * 2 AS v2,
               CASE WHEN value > 50 THEN 'high' ELSE 'low' END AS tier,
               ((value > 10 OR value < 2)
                AND props IS NOT NULL
                AND NOT (user_id % 3 = 0)) AS ok,
               CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
        FROM events
    )
    SELECT kind, tier,
           count(*) AS n,
           round(sum(v2), 2) AS total_v2,
           round(avg(k), 4) AS avg_k,
           count(DISTINCT u) AS n_users,
           sum(CASE WHEN ok THEN 1 ELSE 0 END)::BIGINT AS n_ok
    FROM msg
    GROUP BY kind, tier
    """,
)
def jsonata_transform_compiled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full message transform through the compiled JSONata backend: object
    constructor, $uppercase, arithmetic, conditional, $number + string
    functions — then a relational aggregate over the transformed fields.

    Round 5: also carries the §2.6 comparison/boolean surface ("ok":
    and/or precedence, ``$exists``, ``$not``, ``%``) so the row keeps an
    in-window driver slot while jsonata_filter_compiled rotates out of the
    verification window (still pytest hash-checked)."""
    df = _payload_df(spark, sf_dir)
    tc = compile_column(_TRANSFORM, col("v"), object_root=True)
    # untransformed path fields stay VariantType; cast to concrete types
    # before grouping (variant cannot be a shuffle key)
    out = df.select(tc.col.alias("m")).select(
        col("m.kind").alias("kind"),
        col("m.tier").alias("tier"),
        col("m.v2").alias("v2"),
        col("m.k").alias("k"),
        col("m.ok").cast("boolean").alias("ok"),
        col("m.u").cast("long").alias("u"),
    )
    return out.groupBy("kind", "tier").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("v2"), 2).alias("total_v2"),
        F.round(F.avg("k"), 4).alias("avg_k"),
        F.countDistinct("u").alias("n_users"),
        F.sum(F.when(col("ok"), 1).otherwise(0)).alias("n_ok"),
    )


@query(
    "jsonata_filter_compiled",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) > 50
      AND value > 10
    GROUP BY event_type
    """,
)
def jsonata_filter_compiled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A JSONata boolean expression compiled to a pushdown-friendly filter:
    the predicate runs as a native Column, so Catalyst can reorder it with
    the scan. props is parsed into the payload as a nested object so the
    JSONata path ``props.k`` navigates it directly."""
    ev = load(spark, "events", sf_dir)
    df = ev.withColumn(
        "payload",
        F.to_json(
            F.struct(
                "event_type",
                "value",
                F.from_json("props", "k double").alias("props"),
            )
        ),
    ).withColumn("v", F.try_parse_json("payload"))
    pred = compile_column("$number(props.k) > 50 and value > 10",
                         col("v"), object_root=True)
    return (
        df.filter(pred.col)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "jsonata_transform_typed",
    oracle="""
    WITH msg AS (
        SELECT user_id AS u,
               upper(event_type) AS kind,
               value * 2 AS v2,
               CASE WHEN value > 50 THEN 'high' ELSE 'low' END AS tier,
               CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
        FROM events
    )
    SELECT kind, tier,
           count(*) AS n,
           round(sum(v2), 2) AS total_v2,
           round(avg(k), 4) AS avg_k,
           count(DISTINCT u) AS n_users
    FROM msg
    GROUP BY kind, tier
    """,
)
def jsonata_transform_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TYPED fast path: the same transform as
    jsonata_transform_compiled, but compiled against a declared message
    schema (from_json struct) instead of a variant — struct navigation +
    concrete types keep the whole stage inside codegen (asserted in
    tests/test_plans.py). This is the 100 TB path when the schema is
    known."""
    from mqtt_streamr_spark.jsonata.compiler import compile_typed

    schema = ("event_id long, user_id long, event_type string, "
              "value double, props string")
    ev = load(spark, "events", sf_dir)
    df = ev.withColumn(
        "payload",
        F.to_json(F.struct("event_id", "user_id", "event_type", "value",
                           "props")),
    ).withColumn("m", F.from_json(F.col("payload"), schema))
    tc = compile_typed(_TRANSFORM, col("m"), schema)
    out = df.select(tc.col.alias("t")).select(
        col("t.kind").alias("kind"),
        col("t.tier").alias("tier"),
        col("t.v2").alias("v2"),
        col("t.k").alias("k"),
        col("t.u").cast("long").alias("u"),
    )
    return out.groupBy("kind", "tier").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("v2"), 2).alias("total_v2"),
        F.round(F.avg("k"), 4).alias("avg_k"),
        F.countDistinct("u").alias("n_users"),
    )


_HOF_TRANSFORM = """
{
  "kind": event_type,
  "total": $reduce($map(vals, function($x){ $x * 2 }),
                   function($a, $x){ $a + $x }, 0),
  "nbig": $count($filter(vals, function($x){ $x > 10 })),
  "mx": $reduce(vals, function($a, $x){ $a > $x ? $a : $x }),
  "tag": $uppercase($substring(event_type, 0, 3)) & ':'
         & $string($count(vals)),
  "b64": $base64encode(event_type)
}
"""


@query(
    "jsonata_hof_compiled",
    oracle="""
    WITH msg AS (
        SELECT event_type AS kind,
               [value, value * 2, CAST(user_id % 7 AS DOUBLE)] AS vals,
               upper(substring(event_type, 1, 3)) || ':3' AS tag,
               to_base64(encode(event_type)) AS b64
        FROM events),
    t AS (
        SELECT kind, tag, b64,
               list_sum(list_transform(vals, x -> x * 2)) AS total,
               len(list_filter(vals, x -> x > 10)) AS nbig,
               list_max(vals) AS mx
        FROM msg)
    SELECT kind, count(*) AS n,
           round(sum(total), 2) AS sum_total,
           sum(nbig) AS sum_nbig,
           round(avg(mx), 4) AS avg_mx,
           max(tag) AS max_tag,
           max(b64) AS max_b64
    FROM t GROUP BY kind
    """,
)
def jsonata_hof_compiled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array HOFs on the compiled path: $map/$filter/$reduce (with and
    without init) over a per-message array, entirely as native Columns
    (transform/filter/aggregate — SURVEY.md §2.6 'Array HOFs' row).

    Round 5: also carries the §2.6 string (``$uppercase``/``$substring``/
    ``&``/``$string``) and encoding (``$base64encode``) surface so those
    rows keep an in-window driver slot while jsonata_string_functions
    rotates out of the verification window (still pytest hash-checked)."""
    ev = load(spark, "events", sf_dir)
    df = ev.withColumn(
        "payload",
        F.to_json(
            F.struct(
                "event_type",
                F.array(
                    col("value"),
                    col("value") * 2,
                    (col("user_id") % 7).cast("double"),
                ).alias("vals"),
            )
        ),
    ).withColumn("v", F.try_parse_json("payload"))
    tc = compile_column(_HOF_TRANSFORM, col("v"), object_root=True)
    # kind stays VariantType through the transform; variant cannot be a
    # shuffle key, so cast before grouping
    out = df.select(tc.col.alias("m")).select(
        col("m.kind").cast("string").alias("kind"),
        col("m.total").alias("total"),
        col("m.nbig").alias("nbig"),
        col("m.mx").alias("mx"),
        col("m.tag").cast("string").alias("tag"),
        col("m.b64").cast("string").alias("b64"),
    )
    return out.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("total"), 2).alias("sum_total"),
        F.sum("nbig").alias("sum_nbig"),
        F.round(F.avg("mx"), 4).alias("avg_mx"),
        F.max("tag").alias("max_tag"),
        F.max("b64").alias("max_b64"),
    )


@query(
    "jsonata_interpreted_fallback",
    oracle="""
    SELECT event_type AS kind, count(*) AS n,
           sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT
           AS sum_k
    FROM events WHERE event_id % 5 = 0 GROUP BY event_type
    """,
)
def jsonata_interpreted_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The interpreter fallback end-to-end (SURVEY.md §2.8 path 2): a
    RECURSIVE lambda is interpreter-only by design (a self-referencing
    closure has no bounded Column expansion; bare ``**`` — this query's
    previous trigger — compiles since r7), so transform_to_json
    transparently drops the WHOLE expression to the Arrow-batched
    interpreter pandas UDF — same semantics, slower path, still fully
    distributed. Like the other demo queries, runs on a 20% systematic
    sample (event_id % 5 = 0, restated in the oracle) — the point is
    the fallback contract, not pushing the corpus through the
    deliberately-slow backend."""
    from mqtt_streamr_spark.streaming.transform import transform_to_json

    ev = load(spark, "events", sf_dir).filter(col("event_id") % 5 == 0)
    df = ev.withColumn(
        "payload",
        F.to_json(F.struct(
            "event_type", F.from_json("props", "k long").alias("props"),
        )),
    )
    out_col, backend = transform_to_json(
        '($depth := function($x){ $x <= 0 ? 0 : $depth($x - 1) + 1 };'
        ' {"kind": event_type, "k": $sum(**.k), "nd": $depth(4)})',
        F.col("payload"),
    )
    assert backend == "interpreted", backend
    m = df.withColumn(
        "m", F.from_json(out_col, "kind string, k long")
    )
    return (
        m.select(
            F.col("m.kind").alias("kind"),
            F.col("m.k").alias("k"),
        )
        .groupBy("kind")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("sum_k"))
    )


@query(
    "jsonata_string_functions",
    oracle="""
    SELECT upper(substring(event_type, 1, 3)) AS prefix,
           concat(event_type, ':', CAST(user_id % 5 AS VARCHAR)) AS tag,
           count(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def jsonata_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$uppercase/$substring/& string surface through the compiler."""
    df = _payload_df(spark, sf_dir).withColumn(
        "payload2",
        F.to_json(
            F.struct(
                "event_type", (col("user_id") % 5).cast("long").alias("u5")
            )
        ),
    ).withColumn("v2", F.try_parse_json("payload2"))
    prefix = compile_column("$uppercase($substring(event_type, 0, 3))",
                            col("v2"), object_root=True)
    tag = compile_column("event_type & ':' & $string(u5)", col("v2"),
                         object_root=True)
    return (
        df.select(prefix.col.alias("prefix"), tag.col.alias("tag"))
        .groupBy("prefix", "tag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "jsonata_descendants_typed",
    oracle="""
    SELECT event_type AS kind, count(*) AS n,
           round(sum(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 2)
           AS sum_k
    FROM events GROUP BY event_type
    """,
)
def jsonata_descendants_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``**`` descendants on the TYPED fast path: with a declared message
    schema the descendant traversal expands statically to struct
    navigations (no interpreter, stays in codegen) — the same transform
    that jsonata_interpreted_fallback runs schemaless on the slow path
    (reference: arbitrary --transform, bin/mqtt-streamr.js:158). r12:
    struct-direct in/out (transform_typed_struct) — the JSON encoding
    round-trip deleted per guide §4; bit-identical (parity-pinned,
    oracle-hashed)."""
    from mqtt_streamr_spark.streaming.transform import transform_typed_struct

    ev = load(spark, "events", sf_dir)
    out_col, backend = transform_typed_struct(
        '{"kind": event_type, "k": $sum(**.k)}',
        F.struct(
            "event_type", F.from_json("props", "k double").alias("props"),
        ),
        schema="event_type string, props struct<k: double>",
        out_schema="kind string, k double",
    )
    assert backend == "typed", backend
    m = ev.withColumn("m", out_col)
    return (
        m.select(col("m.kind").alias("kind"), col("m.k").alias("k"))
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("k"), 2).alias("sum_k"),
        )
    )


@query(
    "jsonata_descendants_variant",
    oracle="""
    SELECT event_type AS kind, count(*) AS n,
           round(sum(coalesce(CAST(json_extract_string(props, '$.k')
                                   AS DOUBLE), 0)
                     + CAST(user_id % 7 AS DOUBLE)), 2) AS sum_k
    FROM events WHERE event_id % 5 = 0 GROUP BY event_type
    """,
)
def jsonata_descendants_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``**`` descendants on the SCHEMALESS variant path (r6, previously
    interpreter-only): with no declared schema, ``$sum(**.k)`` compiles to
    a depth-bounded pre-order recursion over the raw JSON text (document
    order; the variant binary sorts keys) — no Python in the hot path.
    The payload nests ``k`` at two different depths so the traversal is
    genuinely recursive (reference: arbitrary --transform,
    bin/mqtt-streamr.js:158). Honest per-op cost note: variant
    expressions run outside codegen, so this is ~2x slower per row than
    the Arrow interpreter (measured, compiler.py) — its value is staying
    JVM-only and composable; hot schemaless paths should use the typed
    backend (jsonata_descendants_typed / infer_message_schema — measured
    ~19us/row on the same transform, parse-dominated). Like the other
    variant demo queries, runs on a 20% systematic sample (event_id %
    5 = 0, restated in the oracle): the point is plan-shape + semantics
    proof, not scanning the corpus through a non-codegen expression."""
    from mqtt_streamr_spark.streaming.transform import transform_to_json

    ev = load(spark, "events", sf_dir).filter(col("event_id") % 5 == 0)
    df = ev.withColumn(
        "payload",
        F.to_json(F.struct(
            "event_type",
            F.struct(
                F.from_json("props", "k double").getField("k").alias("k"),
                F.struct(
                    (col("user_id") % 7).cast("double").alias("k")
                ).alias("inner"),
            ).alias("outer"),
        )),
    )
    out_col, backend = transform_to_json(
        '{"kind": event_type, "k": $sum(**.k)}', F.col("payload"),
        mode="compiled",  # this query PROVES the compiled ** machinery;
        # mode=auto would (correctly) pick the faster interpreter for
        # schemaless descendants per the r8 cost model (transform.py)
    )
    assert backend == "compiled", backend
    m = df.withColumn(
        "m", F.from_json(out_col, "kind string, k double")  # parse ONCE
    )
    return (
        m.select(col("m.kind").alias("kind"), col("m.k").alias("k"))
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("k"), 2).alias("sum_k"),
        )
    )


@query(
    "jsonata_descendants_bare",
    oracle="""
    SELECT event_type AS kind, count(*) AS n,
           sum(5 + CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                        THEN 1 ELSE 0 END)::BIGINT AS sum_all,
           sum(3 + CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                        THEN 1 ELSE 0 END)::BIGINT AS sum_outer
    FROM events WHERE event_id % 20 = 0 GROUP BY event_type
    """,
)
def jsonata_descendants_bare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BARE ``**`` (no trailing name step) on the variant path, compiled
    (r7): every descendant VALUE in pre-order — arrays flattened into
    the walk, objects and scalars emitted, the root leading. Previously
    the largest interpreter-only fallback (COVERAGE.md ⚙ list); now the
    same depth-bounded raw-text recursion as ``**.k``. The oracle
    restates the per-row descendant counts structurally (payload =
    root{event_type, outer{k?, inner{k}}} -> 5 values + optional k).
    5% systematic sample (vs the 20% of the **.k query): bare **
    visits EVERY node per row (~2x the **.k per-row cost, measured
    row-dominated at sf0.1), the heaviest variant-path construct — the
    sample proves plan shape + semantics without scanning the corpus
    through a non-codegen expression."""
    from mqtt_streamr_spark.streaming.transform import transform_to_json

    ev = load(spark, "events", sf_dir).filter(col("event_id") % 20 == 0)
    df = ev.withColumn(
        "payload",
        F.to_json(F.struct(
            "event_type",
            F.struct(
                F.from_json("props", "k double").getField("k").alias("k"),
                F.struct(
                    (col("user_id") % 7).cast("double").alias("k")
                ).alias("inner"),
            ).alias("outer"),
        )),
    )
    out_col, backend = transform_to_json(
        '{"kind": event_type, "n_all": $count(**),'
        ' "n_outer": $count(outer.**)}',
        F.col("payload"),
        mode="compiled",  # proves the compiled bare-** machinery; auto
        # now routes schemaless descendants to the interpreter (r8 cost
        # model, transform.py) — the sample below stays justified
        # because THIS query deliberately runs the slower-but-JVM-only
        # backend to assert its plan shape
    )
    assert backend == "compiled", backend
    m = df.withColumn(
        "m",
        F.from_json(out_col, "kind string, n_all double, n_outer double"),
    )
    return (
        m.select(col("m.kind").alias("kind"), col("m.n_all").alias("n_all"),
                 col("m.n_outer").alias("n_outer"))
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_all").cast("long").alias("sum_all"),
            F.sum("n_outer").cast("long").alias("sum_outer"),
        )
    )


@query(
    "jsonata_groupby_typed",
    oracle="""
    SELECT event_type AS kind, count(*) AS n,
           round(sum(coalesce(value, 0)
                     + CASE WHEN user_id % 2 = 0 THEN 1.0 ELSE 0 END), 2)
           AS lo_sum,
           round(sum(2 * coalesce(value, 0)
                     + CASE WHEN user_id % 2 = 1 THEN 1.0 ELSE 0 END), 2)
           AS hi_sum
    FROM events GROUP BY event_type
    """,
)
def jsonata_groupby_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Object-constructor grouping ``{}`` on the TYPED fast path:
    ``items{c: $sum(p)}`` compiles to array_distinct + map_from_entries
    Column work (SURVEY.md §2.4 'Object-constructor grouping' row,
    previously interpreter-only). The per-item key is data-dependent, so
    real grouping happens per message. r12: struct-direct in/out
    (transform_typed_struct; the dynamic-key result reads via
    element_at on the map encoding) — the JSON encoding round-trip
    deleted per guide §4; bit-identical (parity-pinned,
    oracle-hashed)."""
    from mqtt_streamr_spark.streaming.transform import transform_typed_struct

    ev = load(spark, "events", sf_dir)
    v = F.coalesce(col("value").cast("double"), F.lit(0.0))
    out_col, backend = transform_typed_struct(
        "items{c: $sum(p)}",
        F.struct(F.array(
            F.struct(F.lit("lo").alias("c"), v.alias("p")),
            F.struct(F.lit("hi").alias("c"), (v * 2).alias("p")),
            F.struct(
                F.when(col("user_id") % 2 == 0, "lo").otherwise("hi")
                .alias("c"),
                F.lit(1.0).alias("p"),
            ),
        ).alias("items")),
        schema="items array<struct<c: string, p: double>>",
        out_schema="lo double, hi double",
    )
    assert backend == "typed", backend
    m = ev.withColumn("m", out_col)
    return (
        m.select(
            col("event_type").alias("kind"),
            col("m.lo").alias("lo"),
            col("m.hi").alias("hi"),
        )
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("lo"), 2).alias("lo_sum"),
            F.round(F.sum("hi"), 2).alias("hi_sum"),
        )
    )


@query(
    "jsonata_object_ops_compiled",
    oracle="""
    WITH m AS (
        SELECT event_type AS kind,
               CAST(json_extract(props, '$.k') AS BIGINT) AS kv
        FROM events WHERE event_id % 5 = 0)
    SELECT kind, count(*) AS n,
           sum(kv)::BIGINT AS sum_kv,
           3 AS n_keys,
           'props' AS sifted_first,
           2 AS n_merged,
           'big' AS merged_last
    FROM m GROUP BY kind
    """,
)
def jsonata_object_ops_compiled(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    """The r6 ordered-object surface on the COMPILED variant path, end to
    end: $keys (insertion order from the raw payload), dynamic-key
    $lookup (ordered-map element_at), $sift (map_filter key-dropping)
    and $merge (in-place override) — schemaless input, no declared
    schema, no Python (jsonata/compiler.py ordered-map encoding; plan-
    asserted no-EvalPython in tests/test_plans.py). The oracle restates
    the structure constants (key counts/orderings are fixed by the
    payload shape) plus the data-dependent $lookup sum.

    Runs on a 20% systematic sample (event_id % 5 = 0, restated in the
    oracle): variant expressions evaluate outside whole-stage codegen,
    so FOUR ordered-object expressions per row sit on the interpreted-
    expression floor (~90us/row measured) — the per-row cost is the
    demonstrated property, not the corpus size (the full-corpus scan
    benched ~9 s at sf0.1 for zero extra coverage; same sampling
    precedent as dedup_exact_jaccard_prefix)."""
    ev = load(spark, "events", sf_dir).filter(col("event_id") % 5 == 0)
    df = ev.withColumn(
        "payload",
        F.to_json(F.struct(
            "event_type",
            F.from_json("props", "k long").alias("props"),
            F.struct((col("value") > 50).alias("big")).alias("extra"),
        )),
    )
    v = F.try_parse_json("payload")
    raw = col("payload")
    keys_tc = compile_column("$keys($)", v, raw_col=raw)
    kv_tc = compile_column('$lookup(props, $lowercase("K"))', v, raw_col=raw)
    sift_tc = compile_column(
        '$sift($, function($v, $k){ $k = "props" })', v, raw_col=raw)
    merge_tc = compile_column("$merge([props, extra])", v, raw_col=raw)
    out = df.select(
        col("event_type").alias("kind"),
        F.size(keys_tc.col).alias("n_keys"),
        kv_tc.col.cast("long").alias("kv"),
        # try_element_at: under ANSI mode element_at THROWS on an empty
        # array (a row with missing props/extra would crash the query)
        F.try_element_at(F.map_keys(sift_tc.col), F.lit(1))
        .alias("sifted_first"),
        F.size(F.map_keys(merge_tc.col)).alias("n_merged"),
        F.try_element_at(F.map_keys(merge_tc.col), F.lit(-1))
        .alias("merged_last"),
    )
    return out.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("kv").alias("sum_kv"),
        F.max("n_keys").alias("n_keys"),
        F.min("sifted_first").alias("sifted_first"),
        F.max("n_merged").alias("n_merged"),
        F.max("merged_last").alias("merged_last"),
    )


@query(
    "jsonata_random_seeded",
    oracle="""
    WITH s AS (
      SELECT event_id AS id,
             (1103515245 * (event_id % 2147483648) + 12345) % 2147483648
             AS d1
      FROM events WHERE event_id % 10 = 0),
    s2 AS (SELECT id, d1,
                  (1103515245 * d1 + 12345) % 2147483648 AS d2 FROM s),
    s3 AS (SELECT id, d1, d2,
                  (1103515245 * d2 + 12345) % 2147483648 AS d3 FROM s2)
    SELECT id,
           d1 / 2147483648.0 AS r,
           CASE d2 % 3
             WHEN 0 THEN CASE d3 % 2 WHEN 0 THEN 'bca' ELSE 'cba' END
             WHEN 1 THEN CASE d3 % 2 WHEN 0 THEN 'cab' ELSE 'acb' END
             ELSE        CASE d3 % 2 WHEN 0 THEN 'bac' ELSE 'abc' END
           END AS arr
    FROM s3
    """,
)
def jsonata_random_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEEDED ``$random``/``$shuffle`` (r8 engine extension — verdict-r7
    Next-round #7): the spec's two nondeterministic functions, pinned
    per row to the documented LCG contract (interpreter.SeededLCG) with
    seed = event_id, which turns them from unit-only into hash-exact
    oracle queries — the DuckDB SQL recomputes the SAME LCG stream in
    plain arithmetic (draw 1 -> $random; draws 2-3 -> the two
    Fisher-Yates swaps of a 3-element $shuffle, enumerated as a CASE
    over the 6 permutations). Float exactness: every draw is an
    integer < 2^31 divided by 2^31, exactly representable in float64,
    so both engines produce bit-identical doubles — no rounding needed.
    10% systematic sample (event_id % 10 = 0, restated in the oracle):
    per-row output, so the sample bounds result-set size, not cost."""
    from mqtt_streamr_spark.streaming.transform import (
        seeded_transform_to_json,
    )

    ev = load(spark, "events", sf_dir).filter(col("event_id") % 10 == 0)
    df = ev.withColumn(
        "payload", F.to_json(F.struct("event_id"))
    )
    out_col = seeded_transform_to_json(
        '{"id": event_id,'
        ' "r": $random(),'
        ' "arr": $join($shuffle(["a", "b", "c"]), "")}',
        F.col("payload"), F.col("event_id"),
    )
    m = df.withColumn(
        "m", F.from_json(out_col, "id long, r double, arr string")
    )
    return m.select(
        col("m.id").alias("id"),
        col("m.r").alias("r"),
        col("m.arr").alias("arr"),
    )


@query(
    "jsonata_descendants_auto",
    oracle="""
    SELECT event_type AS kind, count(*) AS n,
           round(sum(coalesce(CAST(json_extract_string(props, '$.k')
                                   AS DOUBLE), 0)
                     + CAST(user_id % 7 AS DOUBLE)), 2) AS sum_k
    FROM events GROUP BY event_type
    """,
)
def jsonata_descendants_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AUTO-mode descendants transform, UNSAMPLED (r8 — the
    verdict-r7 'Done' clause for the backend cost model): the same
    ``$sum(**.k)`` transform as jsonata_descendants_variant, but run
    through ``transform_to_json(mode="auto")`` over the FULL corpus.
    The cost model picks the Arrow interpreter for schemaless
    descendants (~33 us/row measured vs ~50-100 for the compiled
    variant path), which is what makes the unsampled run affordable —
    the compiled-path demos stay sampled because they deliberately run
    the slower JVM-only backend to prove its plan shape. Backend choice
    is asserted, so a cost-model regression fails the oracle gate, not
    just a perf chart."""
    from mqtt_streamr_spark.streaming.transform import transform_to_json

    ev = load(spark, "events", sf_dir)
    df = ev.withColumn(
        "payload",
        F.to_json(F.struct(
            "event_type",
            F.struct(
                F.from_json("props", "k double").getField("k").alias("k"),
                F.struct(
                    (col("user_id") % 7).cast("double").alias("k")
                ).alias("inner"),
            ).alias("outer"),
        )),
    )
    out_col, backend = transform_to_json(
        '{"kind": event_type, "k": $sum(**.k)}', F.col("payload"),
    )
    assert backend == "interpreted", backend  # the cost model's choice
    m = df.withColumn(
        "m", F.from_json(out_col, "kind string, k double")
    )
    return (
        m.select(col("m.kind").alias("kind"), col("m.k").alias("k"))
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("k"), 2).alias("sum_k"),
        )
    )


_XFORM_OP = """
($norm := function($s)<s:s>{ $uppercase($s) };
 $mag := $abs(?);
 $ ~> |$|{'kind': $norm(event_type),
          'dist': $mag(value - 100),
          'high': value > 100}, 'props'|)
"""


@query(
    "jsonata_transform_operator",
    oracle="""
    SELECT upper(event_type) AS kind,
           value > 100 AS high,
           count(*) AS n,
           round(sum(abs(value - 100)), 2) AS total_dist,
           0::BIGINT AS n_props
    FROM events WHERE event_id % 5 = 0
    GROUP BY upper(event_type), value > 100
    """,
)
def jsonata_transform_operator(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    """The JSONata transform operator ``~> |location|update, deletes|``
    end-to-end (r8 — closes the last 1.6.4 operator-surface gap), plus
    partial application (``$abs(?)``) and a signature-checked lambda
    (``<s:s>``) in the same expression. All three are function VALUES /
    runtime-validation constructs — interpreter-only by design — so
    ``transform_to_json`` transparently routes the whole expression to the
    Arrow-batched interpreter UDF (asserted). The update is evaluated with
    the matched object as context; ``'props'`` is deleted from the clone —
    ``n_props`` counts surviving props fields and the oracle pins it to 0.
    Reference contract: jsonata 1.6.4 "Other operators"
    (bin/mqtt-streamr.js:108,157-159 evaluate arbitrary 1.6.4 expressions).
    Like the other interpreter demos, runs on a 20% systematic sample
    (event_id % 5 = 0, restated in the oracle)."""
    from mqtt_streamr_spark.streaming.transform import transform_to_json

    ev = load(spark, "events", sf_dir).filter(col("event_id") % 5 == 0)
    df = ev.withColumn(
        "payload",
        F.to_json(F.struct("event_id", "event_type", "value", "props")),
    )
    out_col, backend = transform_to_json(_XFORM_OP, F.col("payload"))
    assert backend == "interpreted", backend
    m = df.withColumn(
        "m",
        F.from_json(out_col,
                    "kind string, dist double, high boolean, props string"),
    )
    return (
        m.select("m.kind", "m.dist", "m.high", "m.props")
        .groupBy("kind", "high")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("dist"), 2).alias("total_dist"),
            F.sum(F.when(col("props").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_props"),
        )
    )


@query(
    "jsonata_transform_operator_typed",
    oracle="""
    SELECT upper(event_type) AS kind,
           value > 100 AS high,
           count(*) AS n,
           round(sum(abs(value - 100)), 2) AS total_dist,
           0::BIGINT AS n_props
    FROM events
    GROUP BY upper(event_type), value > 100
    """,
)
def jsonata_transform_operator_typed(spark: SparkSession, sf_dir: str
                                     ) -> DataFrame:
    """The transform operator COMPILED (r8): with a declared message
    schema, a root-location ``$ ~> |$|update, deletes|`` compiles to a
    struct rebuild on the typed path — merge-in-place, append, drop —
    entirely inside whole-stage codegen (backend-asserted "typed"; the
    schemaless sibling ``jsonata_transform_operator`` runs the same
    construct through the interpreter with full semantics). Runs
    UNSAMPLED over the corpus: the compiled path has no
    Python-evaluation cost to amortize. r12: the message rides as the
    struct it already is (transform_typed_struct) — the former
    to_json -> from_json -> transform -> to_json -> from_json encoding
    round-trip was four Jackson passes per row of pure overhead (guide
    §4); results are bit-identical (parity-pinned, oracle-hashed)."""
    from mqtt_streamr_spark.streaming.transform import transform_typed_struct

    ev = load(spark, "events", sf_dir)
    out_col, backend = transform_typed_struct(
        "$ ~> |$|{'kind': $uppercase(event_type),"
        "         'dist': $abs(value - 100),"
        "         'high': value > 100}, 'props'|",
        F.struct("event_id", "event_type", "value", "props"),
        schema="event_id bigint, event_type string, value double, "
               "props string",
        out_schema="kind string, dist double, high boolean, props string",
    )
    assert backend == "typed", backend
    m = ev.withColumn("m", out_col)
    return (
        m.select("m.kind", "m.dist", "m.high", "m.props")
        .groupBy("kind", "high")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("dist"), 2).alias("total_dist"),
            F.sum(F.when(col("props").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_props"),
        )
    )


@query(
    "jsonata_transform_nested_typed",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS DOUBLE) > 50 AS big,
           count(*) AS n,
           round(sum(CAST(json_extract_string(props, '$.k') AS DOUBLE) * 2),
                 2) AS sum_k2,
           round(sum(value * 3), 2) AS sum_vt
    FROM events
    GROUP BY CAST(json_extract_string(props, '$.k') AS DOUBLE) > 50
    """,
)
def jsonata_transform_nested_typed(spark: SparkSession, sf_dir: str
                                   ) -> DataFrame:
    """Nested-location transform operator COMPILED (r9): a literal
    name-path location ``|props|update, deletes|`` rebuilds the matched
    sub-struct in place on the typed path, and — because the compiled
    transform result now carries its output StructType (ADVICE r8) — a
    CHAINED second root transform over the result stays compiled too.
    Backend-asserted "typed": the whole two-transform chain is one
    Column plan, no interpreter, no Python. Reference semantics:
    jsonata 1.6.4 transform docs ("each matched object is updated");
    bin/mqtt-streamr.js:108,157-159 evaluate arbitrary 1.6.4
    expressions. Runs UNSAMPLED over the corpus.

    Cost note (measured r9): ~2.3 s plan/compile + ~43 us/row at sf0.1
    — the chained second rebuild references every field of the first
    rebuild's CaseWhen-wrapped struct, so the expression tree roughly
    doubles; whole-stage codegen's subexpression elimination recovers
    part of it. SF-flat compile cost, linear row cost — scale-safe.
    r12: struct-direct in/out (transform_typed_struct) — the JSON
    encoding round-trip deleted per guide §4; bit-identical
    (parity-pinned, oracle-hashed)."""
    from mqtt_streamr_spark.streaming.transform import transform_typed_struct

    ev = load(spark, "events", sf_dir)
    out_col, backend = transform_typed_struct(
        "$ ~> |props|{'k2': k * 2, 'big': k > 50}, 'k'|"
        "  ~> |$|{'vt': value * 3}|",
        F.struct(
            "event_id", "event_type", "value",
            F.from_json("props", "k double").alias("props"),
        ),
        schema="event_id bigint, event_type string, value double, "
               "props struct<k: double>",
        out_schema="props struct<k2: double, big: boolean>, vt double",
    )
    assert backend == "typed", backend
    m = ev.withColumn("m", out_col)
    return (
        m.select("m.props.k2", "m.props.big", "m.vt")
        .groupBy(col("big"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("k2"), 2).alias("sum_k2"),
            F.round(F.sum("vt"), 2).alias("sum_vt"),
        )
    )


@query(
    "jsonata_transform_predicate_typed",
    oracle="""
    WITH items AS (
        SELECT event_type, value AS v, 'a' AS name FROM events
        UNION ALL
        SELECT event_type, value * 2 AS v, 'b' AS name FROM events
    )
    SELECT event_type,
           count(*) AS n_items,
           sum(CASE WHEN v > 50 THEN 1 ELSE 0 END)::BIGINT AS n_big,
           round(sum(CASE WHEN v > 50 THEN v * 2 END), 2) AS sum_v2,
           sum(CASE WHEN v > 50 THEN 0 ELSE 1 END)::BIGINT AS n_names,
           round(sum(CASE WHEN name = 'a' THEN v * 3 END), 2) AS sum_vt
    FROM items
    GROUP BY event_type
    """,
)
def jsonata_transform_predicate_typed(spark: SparkSession, sf_dir: str
                                      ) -> DataFrame:
    """Predicate transform locations COMPILED (r10): a literal name step
    with a static boolean predicate (``|items[v > 50]|update, deletes|``)
    rebuilds ONLY the matched array elements in place — conditional
    append (``big``/``v2`` appear on matches only), conditional delete
    (``name`` survives on non-matches only) — and the result feeds a
    CHAINED root transform, so the whole two-stage plan rides the
    _let-bound linear chain. Backend-asserted "typed": one Column plan,
    no interpreter, no Python. Reference semantics: jsonata 1.6.4
    transform docs (the location selects the objects to update;
    bin/mqtt-streamr.js:108,157-159 evaluate arbitrary 1.6.4
    expressions). The oracle restates the per-item arithmetic
    relationally (each event contributes items a: v=value and
    b: v=2*value). Runs UNSAMPLED over the corpus. r12: struct-direct
    in/out (transform_typed_struct) — the JSON encoding round-trip
    deleted per guide §4; bit-identical (parity-pinned, oracle-hashed)."""
    from mqtt_streamr_spark.streaming.transform import transform_typed_struct

    ev = load(spark, "events", sf_dir)
    out_col, backend = transform_typed_struct(
        "$ ~> |items[v > 50]|{'big': true, 'v2': v * 2}, 'name'|"
        "  ~> |$|{'vt': value * 3}|",
        F.struct(
            "event_id", "event_type", "value",
            F.array(
                F.struct(F.lit("a").alias("name"),
                         col("value").alias("v")),
                F.struct(F.lit("b").alias("name"),
                         (col("value") * 2).alias("v")),
            ).alias("items"),
        ),
        schema="event_id bigint, event_type string, value double, "
               "items array<struct<name: string, v: double>>",
        out_schema="event_type string, vt double, "
                   "items array<struct<name: string, v: double, "
                   "big: boolean, v2: double>>",
    )
    assert backend == "typed", backend
    m = ev.withColumn("m", out_col).select(
        "m.event_type", "m.vt", F.explode("m.items").alias("it"))
    return (
        m.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.when(col("it.big"), 1).otherwise(0))
            .cast("long").alias("n_big"),
            F.round(F.sum("it.v2"), 2).alias("sum_v2"),
            F.sum(F.when(col("it.name").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_names"),
            F.round(F.sum(col("vt") / 2), 2).alias("sum_vt"),
        )
    )


@query(
    "jsonata_transform_computed_typed",
    oracle="""
    WITH items AS (
        SELECT event_type, value AS v, 'a' AS name FROM events
        UNION ALL
        SELECT event_type, value * 2 AS v, 'b' AS name FROM events
    )
    SELECT event_type,
           count(*) AS n_items,
           sum(CASE WHEN name = 'b' THEN 1 ELSE 0 END)::BIGINT AS n_last,
           round(sum(CASE WHEN name = 'b' THEN v END), 2) AS sum_vlast,
           sum(CASE WHEN v > 50 THEN 1 ELSE 0 END)::BIGINT AS n_big,
           round(sum(CASE WHEN v > 50 THEN v * 2 END), 2) AS sum_v2
    FROM items
    GROUP BY event_type
    """,
)
def jsonata_transform_computed_typed(spark: SparkSession, sf_dir: str
                                     ) -> DataFrame:
    """COMPUTED transform locations COMPILED (r11, VERDICT r10
    Next-round #6): the location index and the predicate threshold are
    outer ``:=`` bindings, not literals — ``|items[$i]|`` resolves the
    target position at runtime (floored, negative from the end;
    compiler _transform_loc_dynamic) and ``|items[v > $t]|`` reads the
    bound threshold through the predicate child context — then both
    stages ride the _let-bound linear chain. Backend-asserted "typed":
    one Column plan, no interpreter, no Python. Reference semantics:
    jsonata 1.6.4 path/transform evaluation (bin/mqtt-streamr.js:108,
    157-159 evaluate arbitrary 1.6.4 expressions). The oracle restates
    the per-item arithmetic relationally (items a: v=value,
    b: v=2*value; $i=-1 selects b; $t=50 gates v2). Runs UNSAMPLED.
    r12: struct-direct in/out (transform_typed_struct) — the JSON
    encoding round-trip deleted per guide §4; bit-identical
    (parity-pinned, oracle-hashed)."""
    from mqtt_streamr_spark.streaming.transform import transform_typed_struct

    ev = load(spark, "events", sf_dir)
    out_col, backend = transform_typed_struct(
        "($i := -1; $t := 50;"
        " $ ~> |items[$i]|{'last': true}|"
        "   ~> |items[v > $t]|{'v2': v * 2}|)",
        F.struct(
            "event_id", "event_type", "value",
            F.array(
                F.struct(F.lit("a").alias("name"),
                         col("value").alias("v")),
                F.struct(F.lit("b").alias("name"),
                         (col("value") * 2).alias("v")),
            ).alias("items"),
        ),
        schema="event_id bigint, event_type string, value double, "
               "items array<struct<name: string, v: double>>",
        out_schema="event_type string, "
                   "items array<struct<name: string, v: double, "
                   "last: boolean, v2: double>>",
    )
    assert backend == "typed", backend
    m = ev.withColumn("m", out_col).select(
        "m.event_type", F.explode("m.items").alias("it"))
    return (
        m.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.when(col("it.last"), 1).otherwise(0))
            .cast("long").alias("n_last"),
            F.round(F.sum(F.when(col("it.last"), col("it.v"))), 2)
            .alias("sum_vlast"),
            F.sum(F.when(col("it.v2").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_big"),
            F.round(F.sum("it.v2"), 2).alias("sum_v2"),
        )
    )
