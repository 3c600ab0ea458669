"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (SURVEY §7.1 M6): image/audio/video live as ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample are
Arrow-batched Pandas functions over ``mapInPandas`` so payload bytes never
round-trip through Python row-at-a-time. The media codec libraries (PIL,
ffmpeg, ...) are NOT in this environment, so the codec step is stubbed
behind an import-try (``decode_image``) with a deterministic byte-level
fake ("features" computed from the raw bytes) standing in - the Spark-side
plumbing (schema, batching, partitioning, UDF signature) is real and tested.

Scale: mapInPandas streams Arrow record batches; payload columns should be
stored in their own parquet column chunk (large binary) so column pruning
skips them unless the decode stage runs. Feature extraction is
embarrassingly parallel - no shuffle at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

#: schema of the feature-extraction output (stable driver-visible contract)
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("mean_byte", DoubleType(), True),
    ]
)

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes_in", LongType(), False),
        StructField("n_bytes_out", LongType(), False),
        StructField("mean_byte_out", DoubleType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("mean_byte", DoubleType(), True),
    ]
)

#: byte length of one synthetic "video frame" chunk
FRAME_BYTES = 256


def attach_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesize an opaque binary payload column + typed metadata struct.

    In production the payload is the stored media blob; here it is the
    UTF-8 encoding of the text column (deterministic, testdata-derived).
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def decode_image(blob: bytes):
    """Decode an image payload. STUB: PIL is not available in this
    environment; the real implementation is gated behind the import."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - always taken here
        raise NotImplementedError(
            "image decode requires PIL; this environment stubs the codec step"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(blob))


def extract_features(df: DataFrame) -> DataFrame:
    """Byte-level feature extraction over Arrow batches (mapInPandas).

    The deterministic stand-in feature is the mean byte value of the
    payload - exercises the full binary-column -> pandas -> features path
    that a real decoder would use.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            # one vectorized pass per payload: np.frombuffer is a zero-copy
            # view, .mean() runs in C - never a per-byte Python loop
            n_bytes = payloads.map(len)
            mean_byte = payloads.map(
                lambda b: float(np.frombuffer(b, dtype=np.uint8).mean()) if len(b) else None
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "mean_byte": mean_byte,
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def resize_payloads(df: DataFrame, factor: int = 2) -> DataFrame:
    """"Resize" payloads by an integer downscale factor (mapInPandas).

    The codec-free deterministic kernel keeps every ``factor``-th byte
    (``arr[::factor]``, a strided numpy view - no Python byte loop); a real
    image resize would swap in the PIL kernel behind ``decode_image`` with
    the identical Arrow plumbing, schema, and batch shape. Output proves
    the byte selection (mean of kept bytes), not just the length.
    """
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]

            def kept(b: bytes) -> np.ndarray:
                return np.frombuffer(b, dtype=np.uint8)[::factor]

            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes_in": payloads.map(len),
                    "n_bytes_out": payloads.map(lambda b: len(kept(b))),
                    "mean_byte_out": payloads.map(
                        lambda b: float(kept(b).mean()) if len(b) else None
                    ),
                }
            )

    return df.mapInPandas(batches, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every: int = 4) -> DataFrame:
    """Frame sampling over synthetic "video" payloads (mapInPandas, 1->N).

    The payload is treated as consecutive ``FRAME_BYTES``-byte frames (a
    stand-in for a real container demux, which would live behind the codec
    stub); every ``every``-th frame is emitted as its own output row - the
    1->N row expansion is the real plumbing shape of video frame extraction
    (batch sizes grow by ~len/every, Arrow handles the fan-out, and the
    stage stays shuffle-free/embarrassingly parallel).
    """
    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # one concatenated byte buffer per Arrow batch; every kept frame
            # becomes a (start, length) slice aggregated with np.add.reduceat
            # - no per-frame (let alone per-byte) Python work
            payloads = [np.frombuffer(b, dtype=np.uint8) for b in pdf["payload"]]
            lens = np.array([len(a) for a in payloads], dtype=np.int64)
            n_frames = -(-lens // FRAME_BYTES)
            kept = -(-n_frames // every)  # frames 0, every, 2*every, ...
            doc_ids = np.repeat(pdf["doc_id"].to_numpy(), kept)
            # kept frame indices, per doc: concatenated aranges
            idxs = (
                np.arange(int(kept.sum()), dtype=np.int64)
                - np.repeat(np.concatenate(([0], np.cumsum(kept)[:-1])), kept)
            ) * every
            starts = np.repeat(np.concatenate(([0], np.cumsum(lens)[:-1])), kept)
            f0 = starts + idxs * FRAME_BYTES
            f1 = np.minimum(f0 + FRAME_BYTES, starts + np.repeat(lens, kept))
            sizes = f1 - f0
            buf = np.concatenate(payloads) if payloads else np.empty(0, np.uint8)
            if len(f0):
                # reduceat segments: [f0_i, f1_i) sums at even positions;
                # every index must be < len(buf), and only the LAST end
                # bound can equal it (frames are non-empty, so each start
                # is in range) - drop it and let reduceat run to the end
                bounds = np.empty(2 * len(f0), dtype=np.int64)
                bounds[0::2], bounds[1::2] = f0, f1
                if bounds[-1] == len(buf):
                    bounds = bounds[:-1]
                sums = np.add.reduceat(buf.astype(np.int64), bounds)[0::2]
                means = sums / sizes
            else:
                means = np.empty(0, dtype=np.float64)
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "frame_idx": idxs,
                    "n_bytes": sizes,
                    "mean_byte": means,
                }
            )

    return df.mapInPandas(batches, FRAME_SCHEMA)


#: joint-embedding dimensionality of the alignment towers (hashed
#: bag-of-features space both encoders project into)
ALIGN_DIM = 64
#: sublinear-tf cap of the text tower (the structural difference between
#: the two encoders - see image_tower)
ALIGN_TF_CAP = 3

ALIGN_TOWER_SCHEMA = "doc_id long, dim long, iw long"


def image_tower(df: DataFrame) -> DataFrame:
    """The "vision encoder" of the image-text alignment gate (VERDICT
    r18 #5 - the CLIP-score curation stage, LAION/DataComp: gate
    image-text pairs on joint-embedding cosine BEFORE any other
    curation touches the pair). Input: ``attach_payload`` output
    (opaque binary payload + typed meta); output: the payload's SPARSE
    joint embedding, (doc_id, dim, iw) rows over the ALIGN_DIM hashed
    feature space.

    Deterministic stand-in encoder (the multimodal_phash discipline -
    real CLIP swaps decoded-pixel features in behind the identical
    Arrow plumbing): tokenize the raw payload BYTES on 0x20, drop
    empties, md5-hash each token into one of ALIGN_DIM dimensions
    (int(hexdigest[:15], 16) % D - bit-identical to the JVM/SQL
    md5_int60 rule), weight = raw occurrence count. The text tower
    hashes the SAME backbone from the caption STRING but caps counts
    at ALIGN_TF_CAP (sublinear tf), so an aligned pair scores high but
    not exactly 1 and a mismatched caption scores by vocabulary-profile
    overlap only - the measured sf0.001 separation is aligned
    >= 0.937 vs misaligned mean 0.73 with overlapping tails, a
    realistic gate surface.

    Scale: mapInPandas streams Arrow batches, output is
    corpus-sparse-linear (<= distinct tokens per doc, <= ALIGN_DIM rows
    after the in-kernel collapse), no shuffle; the hashlib.md5 calls
    run per DISTINCT token per doc, not per byte."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        D = ALIGN_DIM
        for pdf in it:
            out = {"doc_id": [], "dim": [], "iw": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                dims: dict[int, int] = {}
                for w in bytes(blob).split(b" "):
                    if not w:
                        continue
                    h = int(hashlib.md5(w).hexdigest()[:15], 16)
                    d = h % D
                    dims[d] = dims.get(d, 0) + 1
                for d, n in dims.items():
                    out["doc_id"].append(int(doc_id))
                    out["dim"].append(d)
                    out["iw"].append(n)
            yield pd.DataFrame(
                {k: pd.array(v, dtype="int64") for k, v in out.items()}
            )

    return df.mapInPandas(batches, ALIGN_TOWER_SCHEMA)


def text_tower(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The "text encoder" of the alignment gate: the same hashed
    bag-of-features backbone as ``image_tower`` - split on single
    spaces, drop empties, md5_int60 % ALIGN_DIM - but weighted by
    SUBLINEAR tf (counts capped at ALIGN_TF_CAP), the structural
    difference that keeps aligned cosines high-but-not-degenerate.
    Output (doc_id, dim, tw) sparse rows; pure JVM expressions (split /
    explode / two map-side-combinable aggregations), no Python in the
    text path."""
    from ..functions.texthash import md5_int60

    words = F.filter(
        F.split(F.col(text_col), " "), lambda w: w != F.lit("")
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(words).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "doc_id",
            F.pmod(md5_int60(F.col("w")), F.lit(ALIGN_DIM)).alias("dim"),
            F.least(F.col("n"), F.lit(ALIGN_TF_CAP)).alias("tw"),
        )
        .groupBy("doc_id", "dim")
        .agg(F.sum("tw").cast("long").alias("tw"))
    )


#: blocks in the content signature (min corpus doc is 44 bytes > 32, so
#: every block is non-empty; 32 bits keeps the signature far inside int64)
PHASH_BLOCKS = 32

PHASH_SCHEMA = "doc_id long, n_bytes long, sig long, n_ones long"


def content_signature(df: DataFrame) -> DataFrame:
    """Block-mean perceptual signature over the binary payload - the
    aHash family (block mean vs global mean) applied to the opaque blob:
    bit i is set iff block i's byte mean exceeds the whole payload's
    mean. The comparison is INTEGER cross-multiplied
    (sum_i * n > total * count_i), so the signature is exact on any
    engine - no float means anywhere. Byte p belongs to block
    p * B // n (the same closed form the SQL oracle applies per
    character; ASCII corpus, so char == byte - the multimodal_extract
    note). A real image pHash swaps the byte stream for decoded,
    DCT'd pixels behind the same mapInPandas shape.

    Input: attach_payload output. Arrow-batched; per payload two
    np.bincount passes - no per-byte Python. Rows shorter than B bytes
    are dropped (none in this corpus; guard matches the oracle)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        B = PHASH_BLOCKS
        for pdf in it:
            out = {"doc_id": [], "n_bytes": [], "sig": [], "n_ones": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(blob, dtype=np.uint8)
                n = len(b)
                if n < B:
                    continue
                idx = (np.arange(n, dtype=np.int64) * B) // n
                sums = np.bincount(idx, weights=b, minlength=B).astype(
                    np.int64
                )
                cnts = np.bincount(idx, minlength=B).astype(np.int64)
                total = int(sums.sum())
                bits = (sums * n) > (total * cnts)
                sig = int((bits.astype(np.int64) << np.arange(B)).sum())
                out["doc_id"].append(int(doc_id))
                out["n_bytes"].append(n)
                out["sig"].append(sig)
                out["n_ones"].append(int(bits.sum()))
            yield pd.DataFrame(
                {
                    k: pd.array(v, dtype="int64")
                    for k, v in out.items()
                }
            )

    return df.mapInPandas(batches, PHASH_SCHEMA)
