"""Multimodal columns: image/audio/video as opaque binary + metadata.

The Spark-side plumbing is real: binary payload columns, typed
metadata structs, Arrow-batched ``mapInPandas`` decode/feature
stages with explicit output schemas, and partition-size guidance for
large blobs. The actual media decoding is STUBBED (this environment
has no image/audio libraries): ``decode_image_stub`` produces a
deterministic fake decode so the distributed plumbing is testable;
swap ``_decode_bytes_stub`` for PIL/librosa/ffmpeg in production.

Scale notes: binary payload rows are large — keep
``spark.sql.files.maxPartitionBytes`` modest and prefer many small
tasks; mapInPandas streams Arrow batches so a partition never has to
fit two copies in memory at once. Metadata-only transforms should
select away the payload column *before* shuffles (column pruning is
the whole game with blob columns).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("checksum", StringType()),
    ]
)


def with_binary_payload(
    df: DataFrame, src_col: str = "text", media_type: str = "image"
) -> DataFrame:
    """Attach an opaque binary payload column (here: utf-8 bytes of a
    source column, standing in for image/audio blobs) plus its media
    type tag. In production this is the raw blob column loaded via
    ``spark.read.format('binaryFile')`` or parquet BYTE_ARRAY."""
    return df.withColumns(
        {
            "payload": F.encode(F.col(src_col), "utf-8"),
            "media_type": F.lit(media_type),
        }
    )


def _decode_bytes_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: derives (width, height) from content
    length. Replace with e.g. ``PIL.Image.open(io.BytesIO(payload)).size``.
    """
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def extract_media_meta(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder=None,
    media_type_col: str = "media_type",
) -> DataFrame:
    """Decode payloads and emit a typed metadata table via mapInPandas.

    Arrow-batched: each batch arrives as a pandas DataFrame; output
    schema is declared (MEDIA_META_SCHEMA) so downstream plans are
    fully typed. Only (id, media_type, payload) are read — project
    before calling so the scan prunes everything else.

    ``decoder`` is ``bytes -> (width, height)``; default is the
    deterministic stub. Pass ``decode_image`` for a real Pillow decode
    — the function is serialized to the executors, so PIL must be
    importable THERE (it resolves the import at call time).
    """
    import hashlib

    decode = decoder if decoder is not None else _decode_bytes_stub

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            widths, heights, checksums, sizes = [], [], [], []
            for payload in pdf[payload_col]:
                b = bytes(payload)
                w, h = decode(b)
                widths.append(w)
                heights.append(h)
                sizes.append(len(b))
                checksums.append(hashlib.md5(b).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media_type": pdf[media_type_col],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "width": pd.Series(widths, dtype="int64"),
                    "height": pd.Series(heights, dtype="int64"),
                    "checksum": checksums,
                }
            )

    # null payloads cannot be decoded — bytes(None) is a TypeError
    # that would poison the whole job from one bad row (r09 review);
    # the null-exclusion contract matches count_min_build
    needed = df.filter(F.col(payload_col).isNotNull()).select(
        id_col, media_type_col, payload_col
    )
    return needed.mapInPandas(_batches, MEDIA_META_SCHEMA)


def _pil():
    """Import Pillow if present, else None — resolved at call time so
    a worker with PIL installed uses it even when the driver-side
    import check ran elsewhere."""
    try:
        import PIL.Image  # noqa: PLC0415

        return PIL.Image
    except ImportError:
        return None


def decode_image(payload: bytes) -> tuple[int, int]:
    """Real image decode: (width, height) via Pillow when importable
    (any format PIL reads — PNG/JPEG/WebP/…), otherwise
    ``NotImplementedError`` so a missing decoder fails loudly instead
    of producing stub geometry that looks real. Pass this as the
    ``decoder`` argument of ``extract_media_meta`` to upgrade the
    metadata stage from stub to real without touching the distributed
    plumbing (schema, batching, partitioning identical)."""
    img_mod = _pil()
    if img_mod is None:
        raise NotImplementedError(
            "image decoding requires Pillow (PIL), not available in this "
            "environment; use extract_media_meta's default stub decoder "
            "or install Pillow on the executors"
        )
    import io

    with img_mod.open(io.BytesIO(payload)) as im:
        return im.size


def resize_image(payload: bytes, factor: int = 4) -> bytes:
    """Real image resize via Pillow (nearest-neighbor ``factor``×
    downsample, re-encoded as PNG), ``NotImplementedError`` without
    it. The PIL-or-fail twin of ``resize_media_stub``'s byte-slice
    stand-in."""
    img_mod = _pil()
    if img_mod is None:
        raise NotImplementedError(
            "image resizing requires Pillow (PIL), not available in this "
            "environment; use resize_media_stub's deterministic stand-in"
        )
    import io

    with img_mod.open(io.BytesIO(payload)) as im:
        # explicit NEAREST: Pillow's default (bicubic for RGB) varies
        # across versions, breaking the documented replayable output.
        # Resampling enum only exists on Pillow >= 9.1; older versions
        # expose the same constant as Image.NEAREST
        nearest = getattr(img_mod, "Resampling", img_mod).NEAREST
        out = im.resize(
            (max(1, im.size[0] // factor), max(1, im.size[1] // factor)),
            resample=nearest,
        )
        buf = io.BytesIO()
        out.save(buf, format="PNG")
        return buf.getvalue()


def decode_image_stub(payload: bytes) -> "object":
    """Back-compat alias for the pre-r07 loud-failure surface; prefer
    ``decode_image`` (same behavior, real decode when PIL exists)."""
    return decode_image(payload)


def frame_sample_stub(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n: int = 10,
) -> DataFrame:
    """Video frame-sampling plumbing: explodes each payload into
    deterministic fake 'frames' (byte slices) via mapInPandas —
    demonstrates the 1→N row fan-out shape a real ffmpeg sampler has.
    """
    if every_n <= 0:
        # validate on the DRIVER: range(step=0) inside the Python
        # worker surfaces as an opaque wrapped task failure after the
        # job launches (r09 review; resize validates factor the same way)
        raise ValueError("every_n must be positive")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", LongType()),
            StructField("frame_bytes", BinaryType()),
        ]
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                for i, off in enumerate(range(0, max(len(b), 1), every_n)):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    frames.append(b[off : off + every_n])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_bytes": frames,
                }
            )

    # null payloads excluded — see extract_media_meta's bytes(None) note
    return (
        df.filter(F.col(payload_col).isNotNull())
        .select(id_col, payload_col)
        .mapInPandas(_batches, schema)
    )


def embed_media_stub(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    dim: int = 16,
) -> DataFrame:
    """Media feature-extraction plumbing: one embedding vector per
    payload via Arrow-batched ``mapInPandas`` — the stage where a real
    pipeline runs CLIP/wav2vec on the decoded media. The stub derives
    component ``i`` from ``md5(payload_bytes || ':' || i)`` (first 8
    hex digits as an integer, scaled to [-1, 1)): deterministic,
    engine-portable (when the payload is utf-8 text the SQL
    ``md5(text || ':' || i)`` reproduces it bit-for-bit — which is how
    the catalog oracle checks this distributed plumbing without the
    model), and downstream-composable with the ANN/similarity surface
    (``array<float>`` column, same as the embeddings table).

    Scale shape: pure per-row map, zero shuffle; batch size bounded by
    Arrow batching, payload never copied beyond the one decode pass.
    Swap the body for the real model inference; schema, partitioning
    and batch handling stay identical.
    """
    import hashlib

    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, vecs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                vec = []
                for i in range(dim):
                    h = hashlib.md5(b + f":{i}".encode()).hexdigest()[:8]
                    vec.append(((int(h, 16) % 2000) - 1000) / 1000.0)
                ids.append(int(doc_id))
                vecs.append(vec)
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "embedding": vecs})

    # null payloads excluded — see extract_media_meta's bytes(None) note
    return (
        df.filter(F.col(payload_col).isNotNull())
        .select(id_col, payload_col)
        .mapInPandas(_batches, schema)
    )


def resize_media_stub(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    factor: int = 4,
) -> DataFrame:
    """Media resize/downsample plumbing: each payload shrinks by
    ``factor`` (every ``factor``-th byte kept — the deterministic
    stand-in for a real bilinear resize; plug PIL/opencv into the
    inner loop) and the typed metadata is re-derived for the resized
    payload. Same Arrow-batched mapInPandas shape as the real thing:
    binary in, smaller binary + new (width, height, n_bytes) out; at
    100 TB this is the bandwidth-dominated map stage that makes
    downstream training readers ``factor²`` cheaper."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("resized_bytes", BinaryType()),
            StructField("n_bytes", LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
        ]
    )
    if factor < 1:
        raise ValueError("factor must be >= 1")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, outs, sizes, ws, hs = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)[::factor]
                w, h = _decode_bytes_stub(b)
                ids.append(int(doc_id))
                outs.append(b)
                sizes.append(len(b))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "resized_bytes": outs,
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "width": pd.Series(ws, dtype="int64"),
                    "height": pd.Series(hs, dtype="int64"),
                }
            )

    # null payloads excluded — see extract_media_meta's bytes(None) note
    return (
        df.filter(F.col(payload_col).isNotNull())
        .select(id_col, payload_col)
        .mapInPandas(_batches, schema)
    )


AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("win_idx", LongType()),
        StructField("start_byte", LongType()),
        StructField("byte_sum", LongType()),
        StructField("checksum", StringType()),
    ]
)


def audio_window_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_len: int = 32,
    hop: int = 16,
) -> DataFrame:
    """Audio framing plumbing: the OVERLAPPING hop-window fan-out an
    STFT/fbank front-end runs over raw waveform bytes (frame_len
    window advanced by hop < frame_len), emitting per-window features
    — here a deterministic energy proxy (byte sum) and an md5
    checksum standing in for the real filterbank vector. Only FULL
    windows are emitted (a trailing partial frame is dropped, the
    usual STFT convention).

    Shape notes (same contract as ``frame_sample_stub``): 1→N row
    fan-out via Arrow-batched mapInPandas with a declared typed
    schema; numpy does the per-window arithmetic so the Python cost
    is per-BATCH, not per-byte. Swap the feature lambda for
    librosa/torchaudio in production — the distributed plumbing
    (schema, batching, overlap arithmetic) is what this operator
    pins."""
    if frame_len <= 0 or hop <= 0:
        raise ValueError("frame_len and hop must be positive")

    import hashlib

    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, starts, sums, sums_md5 = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                arr = np.frombuffer(b, dtype=np.uint8)
                for i, off in enumerate(
                    range(0, len(b) - frame_len + 1, hop)
                ):
                    win = b[off : off + frame_len]
                    ids.append(int(doc_id))
                    idxs.append(i)
                    starts.append(off)
                    sums.append(int(arr[off : off + frame_len].sum()))
                    sums_md5.append(hashlib.md5(win).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "win_idx": pd.Series(idxs, dtype="int64"),
                    "start_byte": pd.Series(starts, dtype="int64"),
                    "byte_sum": pd.Series(sums, dtype="int64"),
                    "checksum": sums_md5,
                }
            )

    return df.filter(F.col(payload_col).isNotNull()).select(
        id_col, payload_col
    ).mapInPandas(
        _batches, AUDIO_WINDOW_SCHEMA
    )
