"""Ship this package to executor Python workers.

Any Python UDF whose closure references ``mqtt_streamr_spark`` needs the
package importable on the worker side. When the driver imported us from a
plain directory (sys.path insert — exactly what the external harness does),
workers won't find it. ``ensure_shipped`` zips the package once and
registers it with addPyFile — idempotent per SparkContext."""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_ATTR = "_mqtt_streamr_spark_shipped"


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # tag hashes file CONTENT state (path + mtime + size), not just the
    # path — otherwise executors keep running a stale zip after any source
    # edit from the same checkout
    state = []
    for root, _dirs, files in os.walk(pkg_dir):
        if "__pycache__" in root:
            continue
        for fn in sorted(files):
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                st = os.stat(full)
                state.append(
                    (os.path.relpath(full, pkg_dir), st.st_mtime_ns,
                     st.st_size)
                )
    tag = hashlib.md5(
        repr((pkg_dir, sorted(state))).encode()
    ).hexdigest()[:12]
    zip_path = os.path.join(
        tempfile.gettempdir(), f"mqtt_streamr_spark_{tag}.zip"
    )
    if not os.path.exists(zip_path):
        tmp = f"{zip_path}.{os.getpid()}.tmp"  # unique per driver process
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    rel = os.path.join(
                        "mqtt_streamr_spark",
                        os.path.relpath(full, pkg_dir),
                    )
                    zf.write(full, rel)
        os.replace(tmp, zip_path)
    sc.addPyFile(zip_path)
    setattr(sc, _SHIPPED_ATTR, True)
