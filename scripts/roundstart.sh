#!/usr/bin/env bash
# Round-start verification habit (VERDICT r3 item 2): the environment can
# change between rounds (runtime swap, regenerated test data), so verify
# BEFORE building. Run from the repo root:
#
#   bash scripts/roundstart.sh          # ~10 min: full suite + fast bench
#   bash scripts/roundstart.sh quick    # ~2 min: correctness gate only
#
set -euo pipefail
cd "$(dirname "$0")/.."

# the driver drops CORRECTNESS_r{N}.json AFTER the round closes, so the
# generated COVERAGE.md ledger is stale by exactly one artifact at every
# round start — regenerate FIRST (VERDICT r8 Missing #2) so the in-sync
# test sees current provenance
python scripts/gen_registry_ledger.py

python - <<'PY'
import pyspark, pyarrow, duckdb, pandas
print(f"pyspark {pyspark.__version__}  pyarrow {pyarrow.__version__}  "
      f"duckdb {duckdb.__version__}  pandas {pandas.__version__}")
import pyarrow.parquet as pq
for sf in ("sf0.001", "sf0.01", "sf0.1"):
    s = pq.read_schema(f"/root/testdata/{sf}/events.parquet")
    print(f"{sf} events.ts physical type: {s.field('ts').type}")
import pyarrow.parquet as pq2
t = pq2.read_table("/root/testdata/sf0.001/embeddings.parquet", columns=["embedding"])
dim = len(t.column("embedding")[0].as_py())
print(f"embedding dim: {dim}" + ("" if dim == 64 else
      "  << CHANGED! update similarity.lsh dim + hyperplane oracles"))
PY

if [ "${1:-full}" = "quick" ]; then
    python -m pytest tests/test_correctness.py tests/test_tables.py -q
else
    python -m pytest tests/ -q
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python bench.py 2>/dev/null | tail -1 \
      | python -c "import json,sys; d=json.load(sys.stdin); print('bench OK:', d['n_queries'], 'queries,', d['n_errors'], 'errors')"
fi
echo "ROUNDSTART OK"
