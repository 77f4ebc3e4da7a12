"""Multimodal-column operators: opaque ``binary`` payloads with typed
metadata, decode/feature-extract plumbing as Arrow-batched Pandas UDFs.

The container has no image/audio libraries, and the testdata has no raw
media, so (per the build contract) the *decode* step is stubbed behind a
deterministic fake while everything Spark-side — binary columns, schema,
partitioning, UDF signatures, Arrow batch shapes — is real and tested.
The payloads here are fabricated from ``documents.text`` (utf-8 bytes) so
the pipeline runs end-to-end on real bytes.

Scale notes: binary payloads ride in parquet pages like any column;
``mapInPandas`` streams Arrow batches so one task never holds more than
``spark.sql.execution.arrow.maxRecordsPerBatch`` payloads in memory. For
100 TB of media the payload column stays in its own parquet files
(columnar pruning skips it unless decoded).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcp_spark.registry import register
from pgcp_spark.sources import load_table

# Magic prefixes for fake format detection over real bytes.
_FORMAT_MAGIC = {"t": "text", "s": "spark-doc", "j": "join-doc"}


def _payload_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload binary, meta struct) — the canonical
    multimodal layout: opaque bytes + typed sidecar metadata."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("lang").alias("lang"),
            F.col("n_chars").alias("declared_size"),
        ).alias("meta"),
    )


@register(
    "multimodal_payload_stats",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
       md5(text) AS payload_md5,
       source AS origin,
       CAST(octet_length(encode(text)) AS BIGINT) = n_chars AS size_consistent
FROM documents
ORDER BY doc_id
""",
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata pass: byte length, content hash, and a
    consistency check of declared vs actual size — all JVM-side binary
    expressions (no decode needed, column pruning keeps payloads on disk
    when only metadata is queried)."""
    p = _payload_df(spark, sf_dir)
    return p.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("payload_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.origin").alias("origin"),
        (F.octet_length("payload").cast("long") == F.col("meta.declared_size")).alias(
            "size_consistent"
        ),
    ).orderBy("doc_id")


FEATURE_DIM = 8


def decode_media(payload: bytes) -> bytes:
    """Stub for the real media decode (PIL/librosa/ffmpeg are not in this
    container). A production deployment replaces this with the actual
    decoder; the Spark-side plumbing is identical."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "container; use fake_features() for the deterministic test path"
    )


def fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for decode→feature-extract: bucket byte
    histogram into FEATURE_DIM bins, normalized by length."""
    if not payload:
        return [0.0] * FEATURE_DIM
    bins = [0] * FEATURE_DIM
    for byt in payload:
        bins[byt % FEATURE_DIM] += 1
    n = len(payload)
    return [b / n for b in bins]


@register(
    "multimodal_feature_extract",
    # The fake decoder is a normalized byte histogram — deterministic and
    # relational, so the oracle replays it exactly: payload text is ASCII
    # (asserted by multimodal_payload_stats' size_consistent check), so
    # ord(char) == byte, and count/total in IEEE double is bit-identical
    # across engines because both operands are exact integers. Driven from
    # documents LEFT JOIN the exploded bins so an empty-text doc (UNNEST
    # over an empty range yields no rows) still produces the same
    # n_bytes=0 / all-zero-features row fake_features emits.
    oracle=f"""
WITH b AS (
  SELECT doc_id, ord(substring(text, CAST(i.i AS INT), 1)) % {FEATURE_DIM} AS bin
  FROM documents, UNNEST(range(1, length(text)+1)) AS i(i)
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_bytes,
         {", ".join(f"CAST(COUNT(*) FILTER (bin={k}) AS DOUBLE)/COUNT(*) AS f{k}" for k in range(FEATURE_DIM))}
  FROM b GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_bytes, 0) AS n_bytes,
       {", ".join(f"COALESCE(a.f{k}, 0.0) AS f{k}" for k in range(FEATURE_DIM))}
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
""",
    doc="mapInPandas decode→feature pipeline over binary payloads",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: the real
    multimodal shape (mapInPandas over (id, payload) → (id, features,
    n_bytes)), with the decoder stubbed deterministically (fake_features
    byte histogram). The feature vector is surfaced as one double column
    per dimension so the driver's pandas canonicalization can sort and
    hash it (list cells can't be ordered)."""
    p = _payload_df(spark, sf_dir).select("doc_id", "payload")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if len(batch) == 0:
                continue
            # NULL payload (NULL text upstream) decodes as zero bytes —
            # the same n_bytes=0 / all-zero-features row the oracle's
            # LEFT JOIN + COALESCE produces for docs with no byte rows
            payloads = [b"" if x is None else bytes(x) for x in batch["payload"]]
            feats = [fake_features(x) for x in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "features": feats,
                    "n_bytes": [len(x) for x in payloads],
                }
            )

    out = p.mapInPandas(extract, schema="doc_id long, features array<double>, n_bytes long")
    return out.select(
        "doc_id",
        "n_bytes",
        *[F.col("features")[k].alias(f"f{k}") for k in range(FEATURE_DIM)],
    ).orderBy("doc_id")


@register(
    "multimodal_format_detect",
    oracle=f"""
SELECT fmt, COUNT(*) AS n_docs, CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
FROM (
  SELECT text,
         CASE substring(text, 1, 1)
           {" ".join(f"WHEN '{k}' THEN '{v}'" for k, v in _FORMAT_MAGIC.items())}
           ELSE 'unknown' END AS fmt
  FROM documents
)
GROUP BY fmt
ORDER BY fmt
""",
)
def multimodal_format_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte format detection over binary payloads (the media-type
    sniffing pass), grouped into per-format size stats."""
    p = _payload_df(spark, sf_dir)
    first_char = F.decode(F.substring("payload", 1, 1), "utf-8")
    fmt = F.lit(None).cast("string")
    expr = None
    for k, v in _FORMAT_MAGIC.items():
        expr = F.when(first_char == k, v) if expr is None else expr.when(first_char == k, v)
    fmt = expr.otherwise("unknown")
    return (
        p.select(fmt.alias("fmt"), F.octet_length("payload").cast("long").alias("nb"))
        .groupBy("fmt")
        .agg(F.count("*").alias("n_docs"), F.sum("nb").alias("total_bytes"))
        .orderBy("fmt")
    )


N_FRAMES = 4
FRAME_BYTES = 16


@register(
    "multimodal_frame_sample",
    oracle=f"""
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(((length(text) - {FRAME_BYTES}) * frame_idx) // {N_FRAMES - 1} AS BIGINT) AS frame_offset,
       md5(substring(text,
                     CAST(((length(text) - {FRAME_BYTES}) * frame_idx) // {N_FRAMES - 1} AS BIGINT) + 1,
                     {FRAME_BYTES})) AS frame_md5
FROM (SELECT doc_id, text, UNNEST(range({N_FRAMES})) AS frame_idx FROM documents
      WHERE length(text) >= {FRAME_BYTES})
ORDER BY doc_id, frame_idx
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary media payloads — the UDTF shape (one
    media row → N_FRAMES frame rows) via mapInPandas: uniform temporal
    sampling at offsets i*(len-frame)/(N-1), each frame fingerprinted.

    A real video pipeline swaps the byte-slice for a decoder frame-grab
    (decode_media stub); offsets, fan-out, Arrow batching, and the output
    schema are exactly what the production path uses. The oracle replays
    the same offset arithmetic relationally (payload text is ASCII, so
    byte slices == char slices).
    """
    import hashlib

    # payloads shorter than one frame have no valid offsets (negative
    # offsets would slice from the END in Python but clamp in SQL); the
    # oracle carries the same guard
    p = (
        _payload_df(spark, sf_dir)
        .select("doc_id", "payload")
        .filter(F.octet_length("payload") >= FRAME_BYTES)
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if len(batch) == 0:
                continue
            out = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame_md5": []}
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                raw = bytes(payload)
                for i in range(N_FRAMES):
                    off = (len(raw) - FRAME_BYTES) * i // (N_FRAMES - 1)
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(off)
                    out["frame_md5"].append(
                        hashlib.md5(raw[off : off + FRAME_BYTES]).hexdigest()
                    )
            yield pd.DataFrame(out)

    out = p.mapInPandas(
        sample, schema="doc_id long, frame_idx int, frame_offset long, frame_md5 string"
    )
    return out.orderBy("doc_id", "frame_idx")
