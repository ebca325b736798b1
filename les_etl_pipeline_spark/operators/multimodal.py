"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas functions via
mapInPandas.

The decode step itself is STUBBED (no image/audio libraries in this
container — decode_image/decode_audio raise NotImplementedError, and
fake_features computes deterministic byte-level features instead), but the
Spark-side plumbing is real and tested: schema contract, binary payloads,
Arrow batch shapes, partition-parallel mapInPandas execution. Swapping the
stub for PIL/librosa changes one function body, not the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# metadata contract for a multimodal asset column
ASSET_SCHEMA = "doc_id long, payload binary, mime string, n_bytes long"
FEATURE_SCHEMA = "doc_id long, mime string, n_bytes long, first_byte int, n_frames int, byte_checksum long"


def to_asset_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a string column as a binary asset table (stand-in for real
    image/audio payloads; the schema is the contract that matters)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
    )


def decode_image(payload: bytes):
    """Real decoder hook — intentionally unimplemented in this container."""
    raise NotImplementedError("image decode requires PIL/opencv; not available here")


def decode_audio(payload: bytes):
    raise NotImplementedError("audio decode requires librosa/soundfile; not available here")


def _fake_feature_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic byte-level 'features' standing in for a real decoder:
    first byte, fake frame count (1 frame per KiB), additive checksum."""
    payloads = pdf["payload"]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "mime": pdf["mime"],
            "n_bytes": pdf["n_bytes"],
            "first_byte": payloads.map(lambda b: int(b[0]) if len(b) else -1),
            "n_frames": pdf["n_bytes"] // 1000 + 1,
            "byte_checksum": payloads.map(lambda b: int(sum(b) % 9973)),
        }
    )


CHUNK_SCHEMA = "doc_id long, chunk_idx int, offset long, n_bytes int, chunk_hex string"


def byte_chunks(assets: DataFrame, chunk_size: int = 64) -> DataFrame:
    """Fixed-size byte-window chunking of binary payloads — the
    frame-sampling / audio-segmentation plumbing pattern: one asset row
    fans out to (chunk_idx, offset, bytes) rows inside an Arrow-batched
    mapInPandas, partition-parallel with no driver involvement. The
    chunk is surfaced as lowercase hex so an engine without binary
    slicing can verify it; a real pipeline would hand `payload[off:]`
    to the decoder instead."""
    import pandas as _pd

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "chunk_idx": [], "offset": [], "n_bytes": [], "chunk_hex": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for idx, off in enumerate(range(0, len(b), chunk_size)):
                    chunk = b[off : off + chunk_size]
                    out["doc_id"].append(doc_id)
                    out["chunk_idx"].append(idx)
                    out["offset"].append(off)
                    out["n_bytes"].append(len(chunk))
                    out["chunk_hex"].append(chunk.hex())
            yield _pd.DataFrame(out)

    return assets.mapInPandas(op, schema=CHUNK_SCHEMA)


def extract_features(assets: DataFrame, batch_size: int | None = None) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Arrow moves
    the bytes JVM->pandas in columnar batches; partition-parallel, no
    driver involvement — the pattern scales to real decoders unchanged."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_feature_batch(pdf)

    return assets.mapInPandas(op, schema=FEATURE_SCHEMA)
