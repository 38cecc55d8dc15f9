"""Data-layout operators: multi-dimensional clustering keys for file
skipping.

The reference has no storage layer at all (it routes records to a broker,
`/root/reference/bin/mqtt-streamr.js:168-200`); at 100 TB the dominant
cost is the scan, and scan cost is decided by LAYOUT: min/max zone maps
let parquet readers skip files, but sorting by one column destroys
locality in every other. A Z-order (Morton) key interleaves the bits of
several columns so rows close in ANY dimension land close in the sort —
after ``repartitionByRange(zkey).sortWithinPartitions(zkey)`` each file's
bounding box is tight in ALL keyed dimensions and selective filters on
any of them prune files (the Delta/Iceberg OPTIMIZE ZORDER idea, as plain
DataFrame ops).

Everything here is map-only codegen Columns — the key costs one pass in
the scan stage; the range partitioning for the write is the same shuffle
any sorted write pays.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def zorder_key(cols: list[str], bits: int = 8) -> Column:
    """Morton/Z-order key: interleave the low ``bits`` bits of each
    column (column j contributes bit i to output bit ``i*ndims + j``).
    Inputs are COLUMN NAMES of non-negative ints in [0, 2^bits) — rank
    or bucket real values first (see ``zorder_bucket``); out-of-range
    values would silently collide, so callers bucket rather than trust
    raw data. (Names, not Columns: the bit-spread uses SQL shiftleft
    with a computed shift amount, which the Python shiftleft() API
    doesn't accept.)

    Pure fold over ``sequence(0, bits-1)`` — one codegen expression, no
    shuffle, no UDF."""
    ndims = len(cols)
    terms = [
        f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT), "
        f"(acc, i) -> acc + shiftleft("
        f"shiftright(CAST({c} AS BIGINT), i) & 1, i * {ndims} + {j}))"
        for j, c in enumerate(cols)
    ]
    return F.expr(" + ".join(terms))


def zorder_bucket(col: str | Column, n_buckets: int) -> Column:
    """Equi-width bucket id in [0, n_buckets) for a non-negative numeric
    column, as the per-dimension input to ``zorder_key``. (At scale you
    would bucket by approx-quantile boundaries broadcast from a sample;
    equi-width keeps the oracle exact here.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(c.cast("long"), F.lit(n_buckets))


def write_zordered(df: DataFrame, path: str, zcols: list[str],
                   bits: int = 8, n_files: int = 8) -> None:
    """Cluster-and-write: range-partition by the z-key so each output
    file covers a tight z-range (=> tight min/max in every keyed
    dimension), sort within partitions for page-level locality, write
    parquet. Readers then prune files from parquet zone maps on ANY of
    the keyed columns."""
    keyed = df
    bcols = []
    for c in zcols:
        bname = f"_zb_{c}"
        keyed = keyed.withColumn(bname, zorder_bucket(c, 1 << bits))
        bcols.append(bname)
    keyed = keyed.withColumn("_zkey", zorder_key(bcols, bits=bits)).drop(
        *bcols)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite").parquet(path)
    )
