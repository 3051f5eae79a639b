"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video content travels as a ``binary`` column next to a
typed metadata struct; heavy per-item work (decode, resize, frame-sample,
feature-extract) runs in Arrow-batched ``mapInPandas`` so bytes never cross
the JVM↔Python boundary row-at-a-time.

Codec availability is probed at call time: where Pillow is installed,
:func:`decode_image` with ``fake=False`` decodes real image dimensions
(``PIL.Image.open`` over the payload bytes — lazy header parse, no full
raster decode for dimensions). This container ships no codec libraries
(PIL/opencv/ffmpeg), so without Pillow the real path raises
``NotImplementedError`` and the deterministic fake decoder carries the
oracle-checkable tests; the PIL-path test auto-activates wherever Pillow
exists (tests/test_pipeline_ops.py). The Spark-side plumbing — schema,
batching, UDF signature, partitioning — is identical either way.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal envelope.
BLOB_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image|audio|video|text
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("head_byte", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def attach_blob(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "text",
    modality: str = "image",
    source_col: str = "source",
) -> DataFrame:
    """Wrap an existing column's bytes as the opaque multimodal payload.

    (Test data has no real media; encoding the text column exercises the
    identical binary-column path a parquet of real JPEG bytes would take.)
    """
    return df.select(
        F.col(id_col).cast("long").alias("item_id"),
        F.lit(modality).alias("modality"),
        F.encode(F.col(payload_col), "UTF-8").alias("content"),
        F.struct(
            F.lit(f"{modality}/x-fake").alias("mime"),
            F.col(source_col).cast("string").alias("source"),
        ).alias("meta"),
    )


def pil_available() -> bool:
    """Whether the optional Pillow dependency is importable here."""
    try:
        from PIL import Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(content: bytes, fake: bool = False) -> tuple[int, int]:
    """Decode image dimensions: real (Pillow, when installed) or the
    deterministic fake for codec-less environments / oracle checks."""
    if not fake:
        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                "real image decode requires Pillow (optional dependency, "
                "not shipped in this environment); pass fake=True for the "
                "deterministic stub"
            ) from e
        import io

        with Image.open(io.BytesIO(content)) as im:
            # .size parses only the header — no raster decode for dims
            return im.width, im.height
    # deterministic fake: dimensions derived from content bytes
    n = len(content)
    return (n % 640) + 1, (n % 480) + 1


def extract_image_meta(blobs: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column.

    ``mapInPandas`` keeps whole partitions in flight (no per-row Python
    dispatch); at scale the input should be partitioned so one batch of
    blobs fits executor memory (driver: spark.sql.files.maxPartitionBytes).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL content (nullable binary column) is treated as an empty
            # payload — one bad row must not TypeError the whole task
            blobs = [b"" if c is None else bytes(c) for c in pdf["content"]]
            dims = [decode_image(c, fake=fake) for c in blobs]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"].astype("int64"),
                    "byte_len": [len(c) for c in blobs],
                    "head_byte": [c[0] if len(c) else -1 for c in blobs],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return blobs.select("item_id", "content").mapInPandas(run, IMAGE_META_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_ms", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)

#: fake-codec parameters: a "video" is its payload cut into fixed-size
#: frames at 25 fps — enough structure to exercise the real plumbing
#: (per-item fan-out, Arrow binary transfer, bounded batches)
_FAKE_FRAME_BYTES = 256
_FAKE_FRAME_MS = 40


def frame_sample(
    blobs: DataFrame, every_n: int = 10, fake: bool = True
) -> DataFrame:
    """Sample every ``every_n``-th frame of each video payload.

    One blob row fans out to ~frames/every_n frame rows inside the SAME
    Arrow batch — bytes never cross the boundary row-at-a-time, and the
    fan-out happens where the blob already lives (no shuffle; downstream
    per-frame work inherits the scan partitioning). The real decoder would
    hand each payload to ffmpeg here; this container ships no codec libs,
    so ``fake=True`` (default) runs a deterministic stand-in — the payload
    cut into 256-byte frames at 25 fps — keeping schema, batch shape and
    fan-out identical to the real path. ``fake=False`` raises, documenting
    the environment gap exactly like :func:`decode_image`.
    """
    if not fake:
        raise NotImplementedError(
            "real frame sampling requires a video codec library (ffmpeg) "
            "not present in this environment; pass fake=True for the "
            "deterministic stand-in"
        )
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"item_id": [], "frame_idx": [], "frame_ms": [], "frame_bytes": []}
            for item_id, content in zip(pdf["item_id"], pdf["content"]):
                content = b"" if content is None else bytes(content)
                n_frames = max(1, len(content) // _FAKE_FRAME_BYTES)
                for i in range(0, n_frames, every_n):
                    out["item_id"].append(int(item_id))
                    out["frame_idx"].append(i)
                    out["frame_ms"].append(i * _FAKE_FRAME_MS)
                    out["frame_bytes"].append(
                        content[i * _FAKE_FRAME_BYTES:(i + 1) * _FAKE_FRAME_BYTES]
                    )
            if out["item_id"]:
                yield pd.DataFrame(out)

    return blobs.select("item_id", "content").mapInPandas(run, FRAME_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)


def resize_images(
    blobs: DataFrame, width: int = 32, height: int = 32, fake: bool = True
) -> DataFrame:
    """Resize every image payload to ``width``×``height``.

    Real path (``fake=False``, needs Pillow): decode, ``Image.resize``,
    emit the raw luminance raster. Codec-less stand-in (default here):
    a deterministic nearest-neighbor resample of the payload BYTES onto
    the target grid — index i of the output maps to byte
    ``floor(i * len / (w*h))``, the same index arithmetic a real
    nearest-neighbor raster resize performs, so batch shape, output
    sizing, and per-item cost scale identically to the real path.

    Scale: pure ``mapInPandas`` over (item_id, content) — no shuffle, the
    resize runs where the blob partition already lives, output is a fixed
    ``w*h`` bytes per item regardless of input size (the usual reason
    training pipelines resize early: it caps downstream bytes/row).
    """
    if width < 1 or height < 1:
        raise ValueError("target dimensions must be >= 1")
    n_out = width * height

    def _resize_fake(content: bytes) -> bytes:
        import numpy as np

        src = np.frombuffer(content, dtype=np.uint8)
        if len(src) == 0:
            return bytes(n_out)
        idx = (np.arange(n_out, dtype=np.int64) * len(src)) // n_out
        return src[idx].tobytes()

    def _resize_real(content: bytes) -> bytes:
        import io

        from PIL import Image

        with Image.open(io.BytesIO(content)) as im:
            return im.convert("L").resize((width, height)).tobytes()

    if not fake and not pil_available():
        raise NotImplementedError(
            "real image resize requires Pillow (optional dependency, not "
            "shipped in this environment); pass fake=True for the "
            "deterministic stand-in"
        )
    resize = _resize_fake if fake else _resize_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"].astype("int64"),
                    "width": width,
                    "height": height,
                    "pixels": [
                        resize(b"" if c is None else bytes(c))
                        for c in pdf["content"]
                    ],
                }
            )

    return blobs.select("item_id", "content").mapInPandas(run, RESIZE_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(blobs: DataFrame, dim: int = 64) -> DataFrame:
    """L1-normalized byte-histogram feature vector per payload.

    Unlike decode/resize this needs NO codec — a ``dim``-bin histogram
    over the raw bytes is a real, deterministic content feature (it is
    what near-dup detectors fall back to for opaque payloads), so there
    is no fake/real split. Vectorized with one ``np.bincount`` per item
    inside the Arrow batch; output rows feed the embedding operators
    (cosine_topk / ivf_topk take any fixed-dim float array).
    """
    if not 1 <= dim <= 256:
        raise ValueError("dim must be in [1, 256]")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for c in pdf["content"]:
                src = np.frombuffer(
                    b"" if c is None else bytes(c), dtype=np.uint8
                )
                if len(src) == 0:
                    feats.append(np.zeros(dim, dtype=np.float32))
                    continue
                # (byte * dim) >> 8 maps [0,255] uniformly onto [0,dim)
                # for ANY dim, including ones that don't divide 256
                h = np.bincount(
                    (src.astype(np.int64) * dim) >> 8, minlength=dim
                )
                feats.append((h / h.sum()).astype(np.float32))
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"].astype("int64"),
                    "features": feats,
                }
            )

    return blobs.select("item_id", "content").mapInPandas(run, FEATURE_SCHEMA)
