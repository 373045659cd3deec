"""Multimodal column plumbing — SURVEY.md §2.10.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct. The Spark-side plumbing is real and tested: schema,
partition-friendly batch shape, Arrow-batched ``mapInPandas`` UDFs with
bounded batch sizes. The actual media decode is STUBBED (the container
ships no image/audio libs): ``decode_image_meta`` uses a deterministic
fake decoder over the byte content so tests and the oracle can verify
the plumbing end-to-end; ``decode_image_real`` raises
NotImplementedError where PIL/libav would be called.

Scale notes: binary payloads ride in parquet as-is; metadata predicates
(mime, width) prune BEFORE any decode UDF runs; ``mapInPandas`` holds
one Arrow batch (not one partition) in memory, so executor memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` x max blob
size — set that down for video-sized blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("source_uri", T.StringType()),
        T.StructField("bytes", T.LongType()),
    ])),
])

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("mime", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("checksum", T.StringType()),
])


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from ``documents`` (the container has no
    real blobs): payload = utf-8 bytes of the text, typed metadata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/fake-image").alias("mime"),
            F.concat(F.lit("synthetic://doc/"), F.col("doc_id")).alias("source_uri"),
            F.length(F.encode("text", "utf-8")).cast("long").alias("bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic fake 'image decode': dimensions derived from the
    byte length. Replace with PIL.Image.open in a real deployment."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def decode_image_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    The UDF signature / batch shape is the production one; only the
    pixel decode inside is the deterministic fake.

    Arrow batch sizing is deliberately NOT set here — mutating
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` inside a plan
    builder would silently shrink batches for every later pandas-UDF op
    in the session. For blob-sized payloads set that conf at session
    build time (session.py) so executor memory stays bounded by
    batch_records x max blob size.
    """

    # NOTE: the closure must be self-contained (no references to this
    # package): cloudpickle serializes module-level functions by
    # reference, and executor workers need not have the repo on their
    # import path. Hence the decode logic is inlined, not _fake_decode.
    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def fake_decode(payload: bytes) -> tuple[int, int]:
            n = len(payload)
            return (n % 640) + 1, (n % 480) + 1

        for pdf in batches:
            payloads = pdf["payload"]
            dims = [fake_decode(bytes(p)) for p in payloads]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "mime": [m["mime"] for m in pdf["meta"]],
                "n_bytes": [len(bytes(p)) for p in payloads],
                "width": [w for w, _ in dims],
                "height": [h for _, h in dims],
                "checksum": [hashlib.md5(bytes(p)).hexdigest() for p in payloads],
            })

    return media.mapInPandas(decode_batches, IMAGE_META_SCHEMA)


def decode_image_real(media: DataFrame) -> DataFrame:
    """Real decoder entry point — requires PIL, absent in this container."""
    raise NotImplementedError(
        "media decode requires pillow/libav; not shipped in this container. "
        "Swap _fake_decode for PIL.Image.open(BytesIO(payload)).size and "
        "reuse decode_image_meta's mapInPandas plumbing.")


def frame_sample_stub(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame.

    The frame extraction is stubbed to deterministic frame indices from
    byte length (a real build calls libav in the same mapInPandas).
    The fake checksum is md5(payload || '#' || decimal_idx) — chosen so
    a SQL oracle can reproduce it over utf-8 payloads (DuckDB
    ``md5(text || '#' || idx)``); a real build would hash actual frame
    pixels here instead."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_checksum", T.StringType()),
    ])

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_checksum": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = max(len(b) // 100, 1)  # fake: 1 frame per 100 bytes
                for idx in range(0, n_frames, every_n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["frame_checksum"].append(
                        hashlib.md5(b + b"#" + str(idx).encode()).hexdigest())
            yield pd.DataFrame(rows)

    return media.mapInPandas(sample, out_schema)


def resize_stub(media: DataFrame, target_w: int = 256,
                target_h: int = 256) -> DataFrame:
    """Image-resize plumbing: aspect-preserving fit into a target box.

    Source dimensions come from the same deterministic fake decode as
    ``decode_image_meta``; the scale/floor arithmetic is plain IEEE
    double math spelled identically in the SQL oracle, and the
    'resized' checksum is md5(payload || '@' || w || 'x' || h) so the
    whole output is SQL-reproducible. A real build swaps the body for
    PIL ``Image.resize`` inside the same mapInPandas batch loop."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("src_w", T.IntegerType()),
        T.StructField("src_h", T.IntegerType()),
        T.StructField("dst_w", T.IntegerType()),
        T.StructField("dst_h", T.IntegerType()),
        T.StructField("resized_checksum", T.StringType()),
    ])

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import math

        rows_cols = ("media_id", "src_w", "src_h", "dst_w", "dst_h",
                     "resized_checksum")
        for pdf in batches:
            rows = {c: [] for c in rows_cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                sw, sh = (n % 640) + 1, (n % 480) + 1
                scale = min(float(target_w) / sw, float(target_h) / sh)
                dw = max(1, math.floor(sw * scale))
                dh = max(1, math.floor(sh * scale))
                rows["media_id"].append(mid)
                rows["src_w"].append(sw)
                rows["src_h"].append(sh)
                rows["dst_w"].append(dw)
                rows["dst_h"].append(dh)
                rows["resized_checksum"].append(hashlib.md5(
                    b + b"@" + f"{dw}x{dh}".encode()).hexdigest())
            yield pd.DataFrame(rows)

    return media.mapInPandas(resize, out_schema)


def feature_extract_stub(media: DataFrame, dim: int = 8) -> DataFrame:
    """Feature-extraction plumbing: one (media_id, dim_idx, value) row
    per feature dimension, long format so the doubles compare cleanly.

    The fake feature is hash-derived — value_i = int(md5(payload ||
    ':' || i)[:8], 16) / 2^32 — uniform in [0, 1) and reproducible by
    the SQL oracle. A real build computes CLIP/ResNet embeddings in the
    same batch loop and emits the same long-format rows."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("dim_idx", T.IntegerType()),
        T.StructField("value", T.DoubleType()),
    ])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = {"media_id": [], "dim_idx": [], "value": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(dim):
                    h = hashlib.md5(b + b":" + str(i).encode()).hexdigest()
                    rows["media_id"].append(mid)
                    rows["dim_idx"].append(i)
                    rows["value"].append(int(h[:8], 16) / 4294967296.0)
            yield pd.DataFrame(rows)

    return media.mapInPandas(extract, out_schema)


AHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("band0", T.LongType()),
    T.StructField("band1", T.LongType()),
    T.StructField("band2", T.LongType()),
    T.StructField("band3", T.LongType()),
])


def ahash_fingerprints(media: DataFrame) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprints over binary media.

    Production shape: decode -> downsample to an 8x8 grayscale grid ->
    threshold each pixel against the grid mean -> 64-bit fingerprint,
    carried as four 16-bit band integers so near-dup banding and
    Hamming verification run on plain BIGINT columns (no 64-bit sign
    gymnastics) — the fingerprint row is exactly the four bands, the
    whole per-item state the streaming corpus table persists. The pixel grid here is the deterministic fake decode
    (four seeded md5 digests of the payload = 64 'pixel' bytes — the
    same md5-reproducibility trick frame_sample_stub uses, so a SQL
    oracle can replay it); a real build swaps ONLY the grid extraction
    for PIL `Image.open(...).convert('L').resize((8, 8))` — the
    thresholding, banding, and pair machinery are unchanged.

    The mean threshold is the integer comparison 64*p > sum(p) —
    no float division anywhere.
    """

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def grid(payload: bytes) -> list[int]:
            px: list[int] = []
            for s in range(4):
                px.extend(hashlib.md5(
                    payload + b":" + str(s).encode()).digest())
            return px

        for pdf in batches:
            out = {"media_id": [],
                   "band0": [], "band1": [], "band2": [], "band3": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = grid(bytes(payload))
                total = sum(px)
                bands = [0, 0, 0, 0]
                for i, p in enumerate(px):
                    if 64 * p > total:
                        bands[i // 16] |= 1 << (i % 16)
                out["media_id"].append(mid)
                for b in range(4):
                    out[f"band{b}"].append(bands[b])
            yield pd.DataFrame(out)

    return media.mapInPandas(hash_batches, AHASH_SCHEMA)


def ahash_bands(fps: DataFrame, id_alias: str = "media_id") -> DataFrame:
    """(id, band_idx, band_val) long form of an aHash fingerprint
    relation — the ONE spelling shared by the batch query, the
    streaming probe, and the stress harness (pure 4-struct explode)."""
    return fps.select(
        F.col("media_id").alias(id_alias),
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_idx"),
                     F.col(f"band{b}").alias("band_val"))
            for b in range(4)])).alias("band")
    ).select(id_alias, "band.band_idx", "band.band_val")


def ahash_hamming(prefix_a: str = "xa", prefix_b: str = "xb"):
    """Hamming-distance expression over two renamed fingerprint sides
    (columns ``{prefix}0..3``) — sum of per-band bit_count(xor)."""
    return sum(
        F.bit_count(F.col(f"{prefix_a}{b}").bitwiseXOR(
            F.col(f"{prefix_b}{b}"))) for b in range(4))


def ahash_side(fps: DataFrame, id_alias: str, prefix: str) -> DataFrame:
    """Fingerprints renamed for one side of a verify join."""
    return fps.select(
        F.col("media_id").alias(id_alias),
        *[F.col(f"band{b}").alias(f"{prefix}{b}") for b in range(4)])
