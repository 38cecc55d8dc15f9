"""Multimodal column pattern: image/audio/video as opaque ``binary`` columns
with a typed metadata struct, processed by Arrow-batched ``mapInPandas``.

The decode step is IMPORT-GATED (the paho pattern from sources/mqtt.py):
``decode_image`` decodes for real when Pillow is importable and
``decode_audio`` when soundfile is — otherwise each raises a clear
NotImplementedError. This container ships neither library, so tests cover
the gate + stub error here and the real branch activates (and is tested)
wherever the libraries exist. ``fake_feature_extractor`` remains the
deterministic stand-in used by queries. The Spark-side plumbing — schema,
batch iteration, partition behavior, UDF signature — is real and tested
either way.

Scale notes: mapInPandas streams Arrow batches, so executor memory is
bounded by batch size (spark.sql.execution.arrow.maxRecordsPerBatch), not
partition size — the right shape for multi-MB media blobs. Keep blobs in
their own column family / table and join on content id; never groupBy a
binary column.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "content_id bigint, media binary, mime string, n_bytes long"
)

FEATURE_SCHEMA = (
    "content_id bigint, n_bytes long, sha_prefix string, "
    "feature_vec array<double>"
)


def attach_media_metadata(df: DataFrame, binary_col: str = "media") -> DataFrame:
    """Typed metadata companion columns for an opaque binary column."""
    return df.withColumn("n_bytes", F.octet_length(F.col(binary_col)).cast("long"))


try:  # import-gate: real decode wherever Pillow exists
    from PIL import Image as _pil_image
except ImportError:  # this container: stays None, stub error below
    _pil_image = None

try:  # import-gate: real decode wherever soundfile exists
    import soundfile as _soundfile
except ImportError:
    _soundfile = None


def decode_image(media_bytes: bytes):
    """Decode an image blob to a loaded PIL image (real when Pillow is
    installed; loud NotImplementedError otherwise — never a silent no-op)."""
    if _pil_image is None:
        raise NotImplementedError(
            "image decoding requires Pillow; pip install pillow and this "
            "function decodes for real (import-gated, no code change)"
        )
    import io

    img = _pil_image.open(io.BytesIO(media_bytes))
    img.load()  # force decode now, surfacing corrupt blobs here
    return img


def decode_audio(media_bytes: bytes):
    """Decode an audio blob to (samples ndarray, sample_rate) via
    soundfile when installed; loud NotImplementedError otherwise."""
    if _soundfile is None:
        raise NotImplementedError(
            "audio decoding requires soundfile; pip install soundfile and "
            "this function decodes for real (import-gated, no code change)"
        )
    import io

    data, sample_rate = _soundfile.read(io.BytesIO(media_bytes))
    return data, sample_rate


def fake_feature_extractor(media_bytes: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding model: md5-seeded pseudo
    features. Same bytes -> same vector, any engine, no libraries."""
    import hashlib

    h = hashlib.md5(media_bytes).digest()
    return [h[i] / 255.0 for i in range(dim)]


def extract_features(df: DataFrame, binary_col: str = "media",
                     id_col: str = "content_id", dim: int = 8) -> DataFrame:
    """The mapInPandas feature-extraction stage. Batch shape: pandas
    DataFrames with the binary column as bytes objects."""

    def batches(it: Iterator) -> Iterator:
        # self-contained closure: executors may not have this package on
        # sys.path (the external harness imports the repo from a bare dir),
        # so only stdlib + pandas are referenced
        import hashlib

        import pandas as pd

        def fake_features(b: bytes) -> list[float]:
            h = hashlib.md5(b).digest()
            return [h[i] / 255.0 for i in range(dim)]

        for pdf in it:
            # NULL media must not kill the stage: treat as zero-byte blobs
            blobs = pdf[binary_col].map(lambda b: b if b is not None else b"")
            out = pd.DataFrame(
                {
                    "content_id": pdf[id_col],
                    "n_bytes": blobs.map(len).astype("int64"),
                    "sha_prefix": blobs.map(
                        lambda b: hashlib.md5(b).hexdigest()[:8]
                    ),
                    "feature_vec": blobs.map(fake_features),
                }
            )
            yield out

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Fixture adapter: treat document text bytes as the opaque media blob
    (the testdata ships no real binaries)."""
    return df.select(
        F.col("doc_id").alias("content_id"),
        F.encode(F.col("text"), "utf-8").alias("media"),
        F.lit("text/plain").alias("mime"),
    )
