"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star extension: image/audio/video as ``binary`` columns with a
metadata struct, processed through Arrow-batched ``mapInPandas``. The
container has no image/audio libraries, so the DECODE step is stubbed
two ways (per the build contract):

  * :func:`decode_image` — real decode behind an import-try (raises
    ``NotImplementedError`` when PIL is absent), so the call site and
    signature are production-shaped;
  * :func:`extract_features` — a clearly-marked DETERMINISTIC FAKE
    featurizer (blake2b-seeded vector per payload) so the Spark-side
    plumbing — schema, batch iteration, partitioning — is real and
    testable end-to-end.

Scale notes: payloads never pass through Python row-at-a-time; every
transform is mapInPandas over Arrow batches. Metadata extraction is a
pure column expression.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

METADATA_FIELDS = "format string, n_bytes long, modality string"


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", fmt: str = "utf8-text"
) -> DataFrame:
    """Testdata shim: materialize an opaque binary column (+ metadata
    struct) from a text column — the shape a real ingest would carry
    for image/audio bytes."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(fmt).alias("format"),
            F.octet_length(payload).alias("n_bytes"),
            F.lit("text").alias("modality"),
        ),
    )


def decode_image(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Decode image bytes → (height, width, mode). REAL decode path;
    requires PIL, which this container does not ship."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image decode requires PIL; install pillow or use "
            "extract_features (deterministic fake) for plumbing tests"
        ) from e

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        import io

        import PIL.Image as Image

        for pdf in batches:
            dims = [Image.open(io.BytesIO(b)).size for b in pdf[bin_col]]
            pdf = pdf.assign(
                width=[d[0] for d in dims], height=[d[1] for d in dims]
            )
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(decode, schema=f"{schema}, width int, height int")


def extract_features(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload"
) -> DataFrame:
    """DETERMINISTIC FAKE featurizer (stands in for a real image/audio
    encoder): 8 floats derived from the payload's blake2b digest,
    normalized to [0,1). The mapInPandas batch shape, output schema,
    and partition behavior are exactly what a real encoder would use —
    swap the body for model inference in production."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = []
            for b in pdf[bin_col]:
                if b is None:
                    feats.append(None)
                    continue
                d = hashlib.blake2b(bytes(b), digest_size=2 * FEATURE_DIM).digest()
                feats.append(
                    [
                        int.from_bytes(d[2 * i : 2 * i + 2], "big") / 65536.0
                        for i in range(FEATURE_DIM)
                    ]
                )
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.mapInPandas(
        featurize, schema=f"{id_col} long, features array<double>"
    )


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    n_frames: int = 4,
) -> DataFrame:
    """Video-style frame sampling stub: split the payload into
    ``n_frames`` evenly-spaced byte chunks (stand-in for keyframe
    extraction), emitted one row per frame — the explode-shaped output
    a real sampler produces."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_idx, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                if b is None:
                    continue
                b = bytes(b)
                step = max(1, len(b) // n_frames)
                for j in range(n_frames):
                    chunk = b[j * step : (j + 1) * step]
                    if not chunk:
                        break
                    ids.append(i)
                    frame_idx.append(j)
                    frames.append(chunk)
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": frame_idx, "frame": frames}
            )

    return df.mapInPandas(
        sample, schema=f"{id_col} long, frame_idx int, frame binary"
    )


def audio_chunk(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    sample_rate: int = 16_000,
    bytes_per_sample: int = 2,
    chunk_seconds: float = 0.25,
) -> DataFrame:
    """Audio segmentation stub: treat the payload as PCM at
    ``sample_rate``×``bytes_per_sample`` and split it into fixed-
    duration chunks (stand-in for VAD/segment extraction), one row per
    chunk with its time bounds — the shape an ASR/data pipeline feeds
    to a transcription or embedding stage. Arrow-batched mapInPandas;
    the real codec decode would slot into the same loop
    (see decode_image's import-gated pattern)."""
    chunk_bytes = int(sample_rate * bytes_per_sample * chunk_seconds)
    if chunk_bytes < 1:
        raise ValueError("chunk too small for the given rate/width")

    def chunker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, ends, chunks = [], [], [], [], []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                if b is None:
                    continue
                b = bytes(b)
                for j in range(0, max(1, (len(b) + chunk_bytes - 1) // chunk_bytes)):
                    chunk = b[j * chunk_bytes : (j + 1) * chunk_bytes]
                    if not chunk and j > 0:
                        break
                    ids.append(i)
                    idxs.append(j)
                    starts.append(j * chunk_seconds)
                    ends.append(
                        j * chunk_seconds
                        + len(chunk) / (sample_rate * bytes_per_sample)
                    )
                    chunks.append(chunk)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "chunk_idx": idxs,
                    "start_s": starts,
                    "end_s": ends,
                    "chunk": chunks,
                }
            )

    return df.mapInPandas(
        chunker,
        schema=(
            f"{id_col} long, chunk_idx int, start_s double, end_s double,"
            " chunk binary"
        ),
    )
