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


RESIZE_SCHEMA = (
    "content_id bigint, in_chars long, out_chars long, "
    "out_media binary, out_sha string"
)


def resize_media(df: DataFrame, target_w: int = 32, target_h: int = 32,
                 binary_col: str = "media", id_col: str = "content_id",
                 mime_col: str = "mime") -> DataFrame:
    """The resize stage of an image pipeline as Arrow-batched mapInPandas.

    Real branch: when Pillow is importable and the blob's mime is image/*,
    decode -> ``Image.resize((target_w, target_h))`` -> re-encode PNG.
    Deterministic fallback (this container, and any non-image mime): treat
    the blob as utf-8 text and "resize" by cropping to the first
    ``target_w * target_h`` CHARACTERS — chosen over byte-cropping so the
    DuckDB oracle can restate it exactly (it cannot slice or md5 blobs).
    Either way the Spark plumbing is identical: binary in, binary out,
    metadata columns alongside (reference has no media ops; this is the
    LLM-pipeline extension surface).

    Scale: map-only (no shuffle); Arrow batch size bounds executor memory,
    not partition size — the right shape for multi-MB blobs.
    """
    cap = target_w * target_h

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        def one(b, mime):
            b = b if b is not None else b""
            if _pil_image is not None and str(mime).startswith("image/"):
                import io

                img = _pil_image.open(io.BytesIO(b))
                img = img.resize((target_w, target_h))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                out = buf.getvalue()
                return len(b), len(out), out, hashlib.md5(out).hexdigest()[:8]
            text = b.decode("utf-8", errors="replace")
            cropped = text[:cap]
            out = cropped.encode("utf-8")
            return (len(text), len(cropped), out,
                    hashlib.md5(out).hexdigest()[:8])

        for pdf in it:
            rows = [one(b, m) for b, m in
                    zip(pdf[binary_col], pdf[mime_col])]
            yield pd.DataFrame(
                {
                    "content_id": pdf[id_col],
                    "in_chars": pd.Series(
                        [r[0] for r in rows], dtype="int64"),
                    "out_chars": pd.Series(
                        [r[1] for r in rows], dtype="int64"),
                    "out_media": [r[2] for r in rows],
                    "out_sha": [r[3] for r in rows],
                }
            )

    return df.mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = (
    "content_id bigint, frame_idx int, frame_chars long, frame_sha string"
)


def sample_frames(df: DataFrame, frame_chars: int = 256, every_k: int = 4,
                  binary_col: str = "media",
                  id_col: str = "content_id") -> DataFrame:
    """Video frame-sampling plumbing: one input blob -> MANY output rows
    (every ``every_k``-th fixed-size frame), the one-to-many mapInPandas
    batch shape a real frame sampler needs. Frames are consecutive
    ``frame_chars``-character windows of the utf-8 text (deterministic
    stand-in for fixed-duration video frames — chosen over byte windows so
    the DuckDB oracle can restate the md5 exactly). A real decoder (pyav /
    opencv) drops into ``one_blob`` without touching the Spark plumbing.

    Scale: map-only explode; output rows per blob are bounded by
    ceil(len/frame_chars)/every_k, and Arrow streams batches so a huge
    blob never materializes its frames at once on the driver.
    """

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        def one_blob(cid, b):
            text = (b if b is not None else b"").decode(
                "utf-8", errors="replace")
            n_frames = (len(text) + frame_chars - 1) // frame_chars
            for i in range(0, n_frames, every_k):
                window = text[i * frame_chars:(i + 1) * frame_chars]
                yield (cid, i, len(window),
                       hashlib.md5(window.encode("utf-8")).hexdigest()[:8])

        for pdf in it:
            out = [row for cid, b in zip(pdf[id_col], pdf[binary_col])
                   for row in one_blob(cid, b)]
            yield pd.DataFrame(
                out, columns=["content_id", "frame_idx", "frame_chars",
                              "frame_sha"],
            ).astype({"content_id": "int64", "frame_idx": "int32",
                      "frame_chars": "int64"})

    return df.mapInPandas(batches, FRAME_SCHEMA)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Fixture adapter: treat document text bytes as the opaque media blob
    (the testdata ships no real binaries)."""
    return df.select(
        F.col("doc_id").alias("content_id"),
        F.encode(F.col("text"), "utf-8").alias("media"),
        F.lit("text/plain").alias("mime"),
    )
