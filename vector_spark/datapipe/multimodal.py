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


def _feature_stub(payload: bytes, dims: int) -> list[float]:
    """Deterministic fake feature vector from the payload bytes (md5-seeded
    values in [-1, 1]); a real build swaps in a vision/audio encoder."""
    import hashlib

    out = []
    h = b""
    while len(out) < dims:
        h = hashlib.md5(h + payload[:64]).digest()
        out.extend(b / 127.5 - 1.0 for b in h)
    return out[:dims]


def extract_features(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    dims: int = 32,
) -> DataFrame:
    """Media -> embedding column (array<float>), Arrow-batched. The output
    feeds the similarity/ANN operators (datapipe.similarity) unchanged —
    the multimodal dedup path is extract_features |> embedding_near_dup."""
    out_schema = f"{id_col} long, embedding array<float>"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "embedding": [_feature_stub(bytes(b), dims) for b in pdf[binary_col]],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(extract, schema=out_schema)


def resize_image(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    width: int = 224,
    height: int = 224,
) -> DataFrame:
    """Image resize plumbing: payload -> (resized binary, new dims). The
    pixel work is STUBBED (deterministic truncate-or-pad of the bytes to
    width*height*3 — a real build calls PIL.Image.resize here); the Arrow
    batch path, binary-in/binary-out schema and size accounting are real.
    """
    out_schema = f"{id_col} long, resized binary, width int, height int, n_bytes long"
    target = width * height * 3

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[binary_col]:
                raw = bytes(b)
                resized = (raw * (target // max(len(raw), 1) + 1))[:target]
                out.append(resized)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "resized": out,
                    "width": width,
                    "height": height,
                    "n_bytes": [len(x) for x in out],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(resize, schema=out_schema)


def frame_sample(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    every_ms: int = 1000,
) -> DataFrame:
    """Video -> sampled frames (1->N): one row per pseudo-frame with
    (frame_idx, offset_ms, frame_sha) — the decode is the stub; the 1->N
    Arrow-batched row expansion, schema, and downstream partitioning are
    the real plumbing. The per-frame fingerprint is md5 over the
    lower-hex of the first 32 payload bytes + '|' + offset (the repo's
    engine-portable hash convention), so the contract query is
    oracle-checkable hash-exact instead of rows-only."""
    import hashlib

    out_schema = f"{id_col} long, frame_idx int, offset_ms int, frame_sha string"

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(payload)
                duration_ms = len(b) % 90_000  # matches _decode_stub
                for i, off in enumerate(range(0, max(duration_ms, 1), every_ms)):
                    sha = hashlib.md5(
                        (b[:32].hex() + "|" + str(off)).encode()
                    ).hexdigest()
                    rows.append((doc_id, i, off, sha))
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "offset_ms", "frame_sha"])

    return df.select(id_col, binary_col).mapInPandas(sample_frames, schema=out_schema)


def _ahash_stub(payload: bytes) -> int:
    """64-bit average hash (aHash) over the payload treated as a
    PRE-DECODED 8x8 luminance grid, tiled if shorter: luma[j] =
    payload[j % len]. A real build replaces the grid derivation with
    PIL decode -> grayscale -> 8x8 resize; the mean-threshold bit rule
    below (the actual aHash definition) stays byte-identical. Unlike the
    md5-seeded stubs above, this one is LOCALLY SENSITIVE — a one-byte
    payload change flips at most a couple of bits, like a small image
    edit — so the near-dup tier over it is structurally honest.

    Bit rule (integer-exact, engine-replayable): bit j set iff
    luma[j] * 64 > sum(luma); empty payload -> hash 0. Result wrapped to
    a signed 64-bit int (Spark LongType)."""
    if not payload:
        return 0
    luma = [payload[j % len(payload)] for j in range(64)]
    total = sum(luma)
    h = 0
    for j, v in enumerate(luma):
        if v * 64 > total:
            h |= 1 << j
    return h - (1 << 64) if h >= (1 << 63) else h


def image_ahash(df: DataFrame, binary_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Media -> 64-bit perceptual hash column (aHash), Arrow-batched.
    Output feeds dedup.hamming_pairs unchanged — the image near-dup path
    is image_ahash |> hamming_pairs, exactly the Manku web-page tier with
    a perceptual fingerprint instead of simhash."""
    out_schema = f"{id_col} long, ahash long"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "ahash": [_ahash_stub(bytes(b)) for b in pdf[binary_col]],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(extract, schema=out_schema)


def image_near_dup(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_blocks: int = 6,
) -> DataFrame:
    """Image near-duplicate pairs: aHash fingerprints -> block-combination
    hamming-ball equi-join (dedup.hamming_pairs; Manku WWW'07 geometry,
    6 blocks / C(6,3)=20 keys for d=3 at 64 bits — the production
    parameters). Candidates carry (id, hash) only; payload bytes never
    cross a shuffle. Emits (doc_a, doc_b, hamming)."""
    from .dedup import hamming_pairs

    return hamming_pairs(
        image_ahash(df, binary_col=binary_col, id_col=id_col),
        fingerprint_col="ahash",
        id_col=id_col,
        bits=64,
        max_hamming=max_hamming,
        n_blocks=n_blocks,
    )
