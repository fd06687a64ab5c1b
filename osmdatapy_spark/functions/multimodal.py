"""Multimodal column plumbing (north-star scope): opaque binary payloads +
typed metadata, processed in Arrow batches via ``mapInPandas``.

The decode step is a STUB (image/audio libraries are not in this
container): ``fake_decode_meta`` derives deterministic pseudo-dimensions
from the payload's md5, so the full Spark plumbing — binary column schema,
batch iteration, output schema, partition-parallelism — is real and
testable, and swapping in PIL/ffmpeg later changes only the inner
function.

Scale shape: mapInPandas streams Arrow batches; payload bytes never
round-trip through Python row objects.  Partitioning is whatever the
binary source gives (e.g. `binaryFile` one-file-per-row, or a parquet
table of blobs); no shuffle is introduced.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_META_SCHEMA = "doc_id long, n_bytes long, fake_width int, fake_height int"


def fake_decode_meta(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decode: (n_bytes, width, height)
    derived from md5(payload).  Replace with a real decoder when the
    imaging libraries are available (raise NotImplementedError there for
    formats you don't handle)."""
    h = hashlib.md5(payload).hexdigest()
    width = 64 + int(h[:2], 16)
    height = 64 + int(h[2:4], 16)
    return len(payload), width, height


def decode_binary_meta(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """Arrow-batched metadata extraction over a binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [fake_decode_meta(b) for b in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pd.array([m[0] for m in meta], dtype="int64"),
                    "fake_width": pd.array([m[1] for m in meta], dtype="int32"),
                    "fake_height": pd.array([m[2] for m in meta], dtype="int32"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=DECODE_META_SCHEMA)
