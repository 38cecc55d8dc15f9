"""Adversarial sweep + microbench for ``strict_json_complete``.

Oracle: Python ``json.loads`` restricted to JS ``JSON.parse`` parity
(reject NaN/Infinity via parse_constant; ensure ASCII-range whitespace
rules match by pre-trimming with the RFC 8259 set). The generator
produces random valid JSON values, then mutates ~half of them with the
trailing-content shapes Spark's ``try_parse_json`` is lenient about
(second value, stray closer, unterminated string, scalar tail, deep
nesting past the regex certificate's bound).

Run:  python scripts/sweep_strict_parse.py [n_cases]
Exit nonzero on any divergence; prints a one-line JSON summary with the
measured per-row overhead (strict check on vs off) at the end.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_WS = " \t\n\r"


def _rand_scalar(r: random.Random) -> object:
    k = r.randrange(6)
    if k == 0:
        return r.randint(-10**9, 10**9)
    if k == 1:
        return r.choice([0, -0.0, 1e-10, 2.5e300, -1.25, 3.0])
    if k == 2:
        return r.choice([True, False, None])
    # strings incl. escapes, quotes, brackets, unicode
    alphabet = 'ab"\\{}[]\n\t\u00e9\u4e16 :,'
    return "".join(r.choice(alphabet) for _ in range(r.randrange(0, 12)))


def _rand_value(r: random.Random, depth: int) -> object:
    if depth <= 0 or r.random() < 0.3:
        return _rand_scalar(r)
    if r.random() < 0.5:
        return [_rand_value(r, depth - 1) for _ in range(r.randrange(0, 4))]
    return {
        f"k{i}_" + "".join(r.choice('a"}]') for _ in range(2)):
            _rand_value(r, depth - 1)
        for i in range(r.randrange(0, 4))
    }


def _mutate(r: random.Random, s: str) -> str:
    k = r.randrange(8)
    if k == 0:
        return s + r.choice(_WS) + s                       # second value
    if k == 1:
        return s + r.choice(["}", "]", "{", "["])          # stray bracket
    if k == 2:
        return s + ' "unterminated' + r.choice(["", "]", "}"])
    if k == 3:
        return s + r.choice([" 5", " null", ' "x"', "x"])  # scalar tail
    if k == 4:
        return r.choice(_WS) * r.randrange(3) + s + r.choice(_WS) * 3
    if k == 5:
        return "[" * 12 + "1" + "]" * 12                   # depth > cert
    if k == 6:
        return json.dumps([[[[[[[[[[1]]]]]]]]]]) + s       # deep + tail
    return s[:-1] if len(s) > 1 else s + "{"               # truncate


def oracle(s: str) -> bool:
    t = s.strip(_WS)
    if not t:
        return False
    try:
        def _reject(_):
            raise ValueError

        json.loads(t, parse_constant=_reject)
    except ValueError:
        return False
    # json.loads already rejects trailing content; but it ALSO accepts
    # control chars Python-leniently? No — loads is strict there. It
    # does accept NaN/Infinity without parse_constant (handled above).
    return True


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    r = random.Random(20260816)
    cases = []
    for _ in range(n):
        s = json.dumps(
            _rand_value(r, r.randrange(1, 6)),
            ensure_ascii=bool(r.randrange(2)),
            separators=r.choice([(",", ":"), (", ", ": ")]),
        )
        if r.random() < 0.5:
            s = _mutate(r, s)
        cases.append(s)

    from mqtt_streamr_spark.session import get_spark
    import pyspark.sql.functions as F
    from mqtt_streamr_spark.operators.parsing import strict_json_complete

    spark = get_spark()
    df = spark.createDataFrame([(c,) for c in cases], "payload string")
    got = [
        row.ok
        for row in df.select(
            (F.try_parse_json("payload").isNotNull()
             & strict_json_complete(F.col("payload"))).alias("ok")
        ).collect()
    ]
    bad = [
        (c, g, oracle(c))
        for c, g in zip(cases, got)
        if bool(g) != oracle(c)
    ]
    for c, g, o in bad[:10]:
        print(f"DIVERGE spark={g} oracle={o}: {c!r}")

    # microbench: strict on vs off over the replicated corpus
    big = df.repartition(1)
    for _ in range(7):  # ~700k rows single-partition
        big = big.union(df.repartition(1)) if False else big
    big = spark.range(0, 1).crossJoin(df).select("payload").repartition(1)
    rows = big.count()
    t0 = time.time()
    big.select(F.try_parse_json("payload").isNotNull().alias("ok")) \
        .agg(F.sum(F.col("ok").cast("int"))).collect()
    base = time.time() - t0
    t0 = time.time()
    big.select(
        (F.try_parse_json("payload").isNotNull()
         & strict_json_complete(F.col("payload"))).alias("ok")
    ).agg(F.sum(F.col("ok").cast("int"))).collect()
    strict = time.time() - t0
    print(json.dumps({
        "cases": n, "divergences": len(bad), "rows_benched": rows,
        "parse_only_sec": round(base, 3), "strict_sec": round(strict, 3),
        "overhead_us_per_row": round((strict - base) / rows * 1e6, 2),
    }))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
