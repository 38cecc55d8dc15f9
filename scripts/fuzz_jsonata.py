#!/usr/bin/env python
"""Batched differential deep-fuzz: compiled Columns vs the interpreter.

Generates N random JSONata expressions (mqtt_streamr_spark.jsonata.fuzzgen),
evaluates each on BOTH backends, and reports any value divergence. Unlike
the in-suite hypothesis test (one Spark action per example), this batches
~BATCH compiled columns into a single select over a one-row DataFrame —
two orders of magnitude more expressions per minute — so it can sweep
tens of thousands of compositions in one session.

Usage:
    python scripts/fuzz_jsonata.py --n 5000 --seed 0 [--depth 3]
    python scripts/fuzz_jsonata.py --backend typed ...   # compile_typed
                                                         # over the doc's
                                                         # declared schema

Exit code 1 iff any mismatch. Prints one JSON summary line at the end.

Classification:
- interpreter JsonataError  -> skipped (documented error->null class)
- NotCompilable             -> skipped (interpreter-only surface)
- batch runtime error       -> bisected to the offending expression,
                               reported as a mismatch (compiled path must
                               never throw where the interpreter returns)
"""

from __future__ import annotations

import argparse
import json
import math
import sys

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from mqtt_streamr_spark.jsonata import jsonata  # noqa: E402
from mqtt_streamr_spark.jsonata.compiler import (  # noqa: E402
    NotCompilable,
    compile_column,
)
from mqtt_streamr_spark.jsonata.errors import JsonataError  # noqa: E402
from mqtt_streamr_spark.jsonata.fuzzgen import FUZZ_DOC, gen_expr  # noqa: E402
from mqtt_streamr_spark.jsonata.values import UNDEFINED  # noqa: E402


def _to_python(v):
    from pyspark.sql import Row

    if hasattr(v, "toPython"):
        return v.toPython()
    if isinstance(v, Row):
        return {k: _to_python(x) for k, x in v.asDict().items()}
    if isinstance(v, dict):
        return {k: _to_python(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_to_python(x) for x in v]
    return v


def _same(expected, actual) -> bool:
    if expected is UNDEFINED:
        return actual is None
    if isinstance(expected, bool):
        return actual is expected or actual == expected
    if isinstance(expected, (int, float)):
        try:
            return actual is not None and math.isclose(
                float(expected), float(actual), rel_tol=1e-9, abs_tol=1e-12)
        except (TypeError, ValueError):
            return False
    if isinstance(expected, list):
        if not isinstance(actual, list) or len(actual) != len(expected):
            return False
        return all(_same(e, a) for e, a in zip(expected, actual))
    if isinstance(expected, dict):
        a = {k: v for k, v in (actual or {}).items() if v is not None}
        e = {k: v for k, v in expected.items() if v is not None}
        return set(a) == set(e) and all(_same(e[k], a[k]) for k in e)
    return actual == expected


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--backend", choices=["variant", "typed"],
                    default="variant")
    args = ap.parse_args()

    from mqtt_streamr_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # ONE partition: createDataFrame parallelizes even a 1-row input to
    # defaultParallelism (32) partitions, and every task — 31 of them
    # empty — still instantiates the full 100-expression batch for its
    # (interpreted-mode, non-codegen) projection. That multiplies peak
    # JVM memory by 32x and OOM'd the 8g driver on deep-composition
    # batches (r8 find: both seeds died in early stages; single-column
    # bisect of the same expressions was fine).
    df = spark.createDataFrame(
        [(json.dumps(FUZZ_DOC),)], "payload string"
    ).coalesce(1)

    # the FUZZ_DOC schema for the typed backend (declared, like a user's
    # PipelineSpec.message_schema)
    FUZZ_SCHEMA = (
        "user string, kind string, value double, count long, ok boolean, "
        "tags array<string>, nums array<double>, "
        "nested struct<k:long, name:string, deep:struct<leaf:string>>, "
        "items array<struct<p:long, q:string>>, "
        "zeros array<long>, mixed array<long>, "
        "lone struct<arr1:array<long>, arr0:array<long>, "
        "arrs:array<string>, arr2:array<long>>"
    )

    def compile_expr(expr):
        if args.backend == "typed":
            from mqtt_streamr_spark.jsonata.compiler import compile_typed

            return compile_typed(
                expr, F.from_json("payload", FUZZ_SCHEMA), FUZZ_SCHEMA)
        return compile_column(expr, F.try_parse_json("payload"),
                              raw_col=F.col("payload"))

    n_err = n_nc = n_ok = 0
    mismatches: list[dict] = []
    pending: list[tuple[str, object, object]] = []  # (expr, expected, col)

    def flush():
        nonlocal n_ok
        if not pending:
            return
        cols = [tc.alias(f"c{i}") for i, (_, _, tc) in enumerate(pending)]
        try:
            row = df.select(*cols).collect()[0]
            results = [
                _to_python(row[f"c{i}"]) for i in range(len(pending))]
        except Exception:
            # bisect: evaluate one-by-one; a compiled column that throws
            # where the interpreter succeeded is itself a divergence.
            # Probe session liveness first — a dead JVM (batch-codegen
            # crash) would otherwise cascade into bogus per-expression
            # "connection refused" mismatches.
            results = []
            for expr, _, tc in pending:
                try:
                    df.first()
                except Exception as exc:  # noqa: BLE001
                    print(json.dumps({"fatal": "spark session died",
                                      "err": str(exc)[:200]}),
                          file=sys.stderr)
                    raise SystemExit(2)
                try:
                    results.append(_to_python(
                        df.select(tc.alias("r")).collect()[0]["r"]))
                except Exception as exc:  # noqa: BLE001
                    results.append(("__RUNTIME_ERROR__", str(exc)[:200]))
        for (expr, expected, _), actual in zip(pending, results):
            if isinstance(actual, tuple) and actual and \
                    actual[0] == "__RUNTIME_ERROR__":
                mismatches.append(
                    {"expr": expr, "kind": "runtime", "err": actual[1]})
            elif not _same(expected, actual):
                mismatches.append({
                    "expr": expr, "kind": "value",
                    "expected": repr(expected), "actual": repr(actual)})
            else:
                n_ok += 1
        pending.clear()

    for i in range(args.n):
        expr = gen_expr(args.seed * 1_000_003 + i, depth=args.depth)
        try:
            expected = jsonata(expr).evaluate(FUZZ_DOC)
        except JsonataError:
            n_err += 1
            continue
        except RecursionError:
            n_err += 1
            continue
        try:
            tc = compile_expr(expr)
        except NotCompilable:
            n_nc += 1
            continue
        except Exception as exc:  # noqa: BLE001 — a compiler crash is a bug
            mismatches.append({"expr": expr, "kind": "compile_error",
                               "err": f"{type(exc).__name__}: {exc}"[:200]})
            continue
        pending.append((expr, expected, tc.col))
        if len(pending) >= args.batch:
            flush()
    flush()

    print(json.dumps({
        "n": args.n, "ok": n_ok, "interp_err_skipped": n_err,
        "not_compilable": n_nc, "mismatches": mismatches[:50],
        "n_mismatch": len(mismatches),
    }))
    return 1 if mismatches else 0


if __name__ == "__main__":
    sys.exit(main())
