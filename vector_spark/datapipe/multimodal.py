"""Multimodal (image/audio/video) column plumbing.

Policy for opaque media: carry the payload as a `binary` column + typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over `mapInPandas` — the batch shape, schema
and partitioning are real; the actual codec call is STUBBED (the sandbox has
no image/audio libs) behind `_decode_stub`, a clearly-marked deterministic
fake keyed on the payload bytes. Swapping in PIL/libav later changes one
function, not the plan.

Scale notes: mapInPandas streams Arrow batches (no collect); binary columns
never pass through a shuffle here — metadata extraction is a narrow map and
downstream grouping should use the (small) metadata columns only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "n_bytes long, magic string, fake_width int, fake_height int, fake_duration_ms int"
)


def _decode_stub(payload: bytes) -> tuple[int, str, int, int, int]:
    """Deterministic fake decode. A real build replaces this with
    PIL.Image.open / av.open; everything else stays identical."""
    n = len(payload)
    magic = payload[:4].hex()
    return n, magic, 64 + n % 577, 64 + n % 353, n % 90_000


def binary_meta(df: DataFrame, binary_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Extract typed metadata from an opaque binary column.

    Arrow-batched (mapInPandas): the decode loop is per-element *inside* a
    vectorized batch, the only pattern available for codec calls — never a
    row-at-a-time Python UDF at the Spark level.
    """
    out_schema = f"{id_col} long, {META_SCHEMA}"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_stub(bytes(b)) for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": [m[0] for m in metas],
                    "magic": [m[1] for m in metas],
                    "fake_width": [m[2] for m in metas],
                    "fake_height": [m[3] for m in metas],
                    "fake_duration_ms": [m[4] for m in metas],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(extract, schema=out_schema)
