"""Multimodal column handling — image/audio/video as opaque ``binary``
columns with typed metadata (BASELINE.json north_star; no counterpart in
the reference, which extracts text-rendered rows only —
``WorkerRunnable.java:202-216``).

Design for 100 TB:
- media payloads are **opaque binary columns** riding in the same
  DataFrame as their typed metadata struct — one scan, no sidecar
  joins; Parquet stores them as BYTE_ARRAY with column-level stats on
  the metadata only;
- per-item compute (decode, feature extraction, frame sampling) runs as
  **Arrow-batched ``mapInPandas``** — the only sanctioned Python hop —
  so a 1000-executor cluster streams batches without row-at-a-time
  pickling;
- pure byte arithmetic (lengths, hashes, slicing) stays **JVM-side**
  (``length``/``sha2``/``substring`` on BinaryType are whole-stage
  codegen'd) — Python is reserved for real codec work.

The container has no image/audio codecs, so ``decode_media`` is a
clearly-marked stub (NotImplementedError) and the tested path uses the
deterministic fake payload below; every piece of Spark plumbing —
schema, batching, partitioning — is real and exercised.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# deterministic media-type cycle keyed on doc_id — a stand-in for a real
# MIME sniff of the payload header
MEDIA_TYPES = ("image", "audio", "video")

FRAME_CHUNK = 64  # bytes per sampled "frame" of the fake payload
FRAME_PREFIX = 16  # bytes of each frame surfaced as hex

N_HIST_BUCKETS = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("histogram", T.ArrayType(T.DoubleType())),
    ]
)


def media_table(documents: DataFrame) -> DataFrame:
    """Derive the deterministic media fixture: the document text encoded
    as the opaque payload plus a typed metadata struct.

    In production this frame comes straight off Parquet with a real
    payload; everything downstream is agnostic to where the bytes came
    from.
    """
    media_type = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.encode(F.col("text"), "utf-8")
    return documents.select(
        "doc_id",
        media_type.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            (F.col("doc_id") % 640 + 16).cast("long").alias("width"),
            (F.col("doc_id") % 480 + 16).cast("long").alias("height"),
            (F.lit(16000)).cast("long").alias("sample_rate"),
        ).alias("meta"),
    )


def media_metadata(documents: DataFrame) -> DataFrame:
    """Typed metadata + content hash per media item — pure JVM-side byte
    ops (length / sha2 on BinaryType), no Python in the plan."""
    m = media_table(documents)
    return m.select(
        "doc_id",
        "media_type",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.sha2(F.col("payload"), 256).alias("payload_sha"),
    )


def frame_sample(documents: DataFrame, chunk: int = FRAME_CHUNK,
                 prefix: int = FRAME_PREFIX) -> DataFrame:
    """Frame sampling: slice the payload into fixed-size chunks and
    surface the hex prefix of each — the plumbing shape of video
    frame extraction (item → (item, frame_idx, frame_bytes) fan-out).

    JVM-side: ``sequence`` + ``posexplode`` + binary ``substring`` —
    a narrow fan-out, no shuffle; at scale the explode multiplies rows
    partition-locally exactly like a real frame sampler would.
    """
    m = media_table(documents)
    n_frames = F.greatest(
        F.lit(1), F.floor(F.col("meta.n_bytes") / F.lit(chunk))
    ).cast("int")
    return (
        m.select(
            "doc_id",
            "media_type",
            "payload",
            F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias(
                "frame_idx", "_off"
            ),
        )
        .select(
            "doc_id",
            "media_type",
            F.col("frame_idx").cast("long").alias("frame_idx"),
            F.hex(
                F.expr(f"substring(payload, frame_idx * {chunk} + 1, {prefix})")
            ).alias("frame_hex"),
        )
    )


def byte_histogram(documents: DataFrame) -> DataFrame:
    """Feature extraction over the opaque payload: a normalized
    ``N_HIST_BUCKETS``-bucket byte histogram per item via Arrow-batched
    ``mapInPandas`` — the real plumbing a learned featurizer would use
    (same signature, same batch shape), with a deterministic kernel.
    """
    m = media_table(documents).select("doc_id", "payload")

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=N_HIST_BUCKETS).astype(
                    "float64"
                )
                total = hist.sum() or 1.0
                out.append((int(doc_id), int(arr.size), (hist / total).tolist()))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_bytes", "histogram"]
            )

    return m.mapInPandas(_featurize, schema=FEATURES_SCHEMA)


def decode_media(documents: DataFrame) -> DataFrame:
    """Decode the payload into pixels/samples.  STUB: the container has
    no codec libraries (PIL/torchaudio/av); the import is gated and the
    kernel raises until one is present.  The surrounding plan — batch
    iterator, schema, partition preservation — is the production shape.
    """
    m = media_table(documents).select("doc_id", "media_type", "payload")

    decoded_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("decoded_shape", T.ArrayType(T.LongType())),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - always taken here
            raise NotImplementedError(
                "media decode requires a codec library (PIL/av); not "
                "available in this environment — see functions/multimodal.py"
            ) from exc
        for pdf in batches:  # pragma: no cover - unreachable without codecs
            yield pdf.assign(decoded_shape=[[] for _ in range(len(pdf))])[
                ["doc_id", "media_type", "decoded_shape"]
            ]

    return m.mapInPandas(_decode, schema=decoded_schema)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_bytes", T.LongType()),
        T.StructField("payload_resized", T.BinaryType()),
    ]
)


def resize_media(documents: DataFrame, target_bytes: int = 256) -> DataFrame:
    """Resize/downscale verb of the media pipeline: cap each payload at
    ``target_bytes`` (the stand-in for an image resample / audio
    downmix — a real codec would transform rather than truncate, but
    the pipeline shape is identical: binary in, smaller binary out,
    per-item Python work in one Arrow-batched ``mapInPandas`` hop).

    Everything around the Python hop is JVM-side: the payload arrives
    as a binary column and the caller hashes/aggregates the resized
    bytes with codegen'd expressions."""
    media = media_table(documents)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_bytes": payloads.str.len().astype("int64"),
                    "payload_resized": payloads.map(
                        lambda b: bytes(b)[:target_bytes]),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        _resize, RESIZE_SCHEMA)


def byte_entropy_arrow(documents: DataFrame) -> DataFrame:
    """Shannon byte-entropy per payload via ``mapInArrow`` — the
    zero-copy tier below ``mapInPandas``: RecordBatches come straight
    off the wire with no pandas materialization, so the per-batch
    overhead is one numpy view per column instead of Series
    construction.  Use this tier for tight numeric kernels over binary
    columns (entropy, checksums, magic-byte sniffing) where pandas
    buys nothing; keep mapInPandas where downstream wants frames.

    Output entropy is scaled to integer milli-bits (round half-up) so
    the pytest ground truth compares exactly.
    """
    import pyarrow as pa

    m = media_table(documents).select("doc_id", "payload")
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("entropy_millibits", T.LongType()),
        ]
    )

    def _entropy(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import numpy as np

        for batch in batches:
            doc_ids = batch.column(0).to_numpy(zero_copy_only=False)
            payloads = batch.column(1).to_pylist()
            ent = np.empty(len(payloads), dtype="int64")
            sizes = np.empty(len(payloads), dtype="int64")
            for i, p in enumerate(payloads):
                arr = np.frombuffer(p, dtype=np.uint8)
                sizes[i] = arr.size
                counts = np.bincount(arr, minlength=256)
                probs = counts[counts > 0] / max(1, arr.size)
                bits = float(-(probs * np.log2(probs)).sum())
                ent[i] = int(np.floor(bits * 1000 + 0.5))
            yield pa.RecordBatch.from_arrays(
                [pa.array(doc_ids), pa.array(sizes), pa.array(ent)],
                names=["doc_id", "n_bytes", "entropy_millibits"],
            )

    return m.mapInArrow(_entropy, schema=out_schema)


def media_phash(documents: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) of each media payload: 64 chunk
    means over the byte stream, bit k set iff chunk k's mean exceeds
    the global mean — the byte-level stand-in for the decode → 8×8
    grayscale downsample → mean-threshold pipeline every public
    image-dedup system bottoms out at.  The Python hop is the codec
    seat (a real deployment decodes pixels here); everything before
    and after stays JVM-side.

    Determinism: the threshold compares INTEGER cross-products
    (chunk_sum · n > total_sum · chunk_len), never a float mean, so the
    hash is bit-identical across engines and numpy versions.  Output
    packs the 64 bits MSB-first into two 32-bit words (``w0`` bits
    0-31, ``w1`` bits 32-63), Hamming-ready and ANSI-overflow-free —
    the same layout as similarity.binary_signatures.
    """
    m = media_table(documents).where(F.length("payload") > 0).select(
        "doc_id", "payload"
    )

    def _ph(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for did, buf in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(bytes(buf), dtype=np.uint8).astype(np.int64)
                n = len(a)
                k = (np.arange(n) * 64) // n
                s = np.zeros(64, dtype=np.int64)
                np.add.at(s, k, a)
                c = np.bincount(k, minlength=64).astype(np.int64)
                # threshold products in PYTHON ints, not numpy: s*n
                # reaches 255·n² and would silently wrap int64 for
                # payloads ≳190 MB, corrupting hash bits exactly where
                # the determinism claim matters (the oracle's HUGEINT
                # side would not wrap).  64 scalar ops per item — free.
                total = int(a.sum())
                sl, cl = s.tolist(), c.tolist()
                bits = [sl[j] * n > total * cl[j] for j in range(64)]
                w0 = w1 = 0
                for j in range(32):
                    w0 = (w0 << 1) | int(bits[j])
                    w1 = (w1 << 1) | int(bits[32 + j])
                out.append((int(did), w0, w1))
            yield pd.DataFrame(out, columns=["doc_id", "w0", "w1"])

    return m.mapInPandas(_ph, schema="doc_id long, w0 long, w1 long")


def media_phash_neardup(
    documents: DataFrame, max_hamming: int = 6
) -> DataFrame:
    """Near-duplicate media pairs by perceptual hash: LSH-band the
    64-bit aHash into 4×16-bit keys, bucket-join on any equal band,
    verify candidates with XOR+popcount.  By pigeonhole the banding is
    RECALL-LOSSLESS for hamming ≤ 3 (4 differing bits cannot dirty all
    4 bands); above that it is the standard LSH recall/candidate-count
    trade — raise recall with multi-probe or more, narrower bands, at
    the cost of bucket collisions.

    Scale shape: never all-pairs — candidates are generated per band
    bucket exactly like the MinHash pipeline; signatures are 16 bytes
    so verification is two popcounts.  All banding/verification is
    JVM-side; Python appears only inside media_phash's codec hop.
    """
    # cache: the signature frame feeds the band explode AND both sides
    # of the verification join — without it the Python codec hop (the
    # expensive decode at real scale) re-runs 3× in one plan (same
    # discipline as minhash_lsh_dedup's shared shingle scan)
    sig = media_phash(documents).cache()
    lo16 = F.lit(0xFFFF)
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                F.shiftright("w0", 16).bitwiseAND(lo16),
                F.col("w0").bitwiseAND(lo16),
                F.shiftright("w1", 16).bitwiseAND(lo16),
                F.col("w1").bitwiseAND(lo16),
            )
        ).alias("band", "val"),
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        F.col("w0").alias("a0"),
        F.col("w1").alias("a1"),
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        F.col("w0").alias("b0"),
        F.col("w1").alias("b1"),
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.bit_count(F.col("a0").bitwiseXOR(F.col("b0")))
                + F.bit_count(F.col("a1").bitwiseXOR(F.col("b1")))
            ).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def media_phash_closest(documents: DataFrame, k: int = 10) -> DataFrame:
    """Index-health report for the perceptual-hash tier: the ``k``
    CLOSEST band-colliding pairs (by exact Hamming, id tie-break) —
    what an operator inspects to pick the dedup threshold for a new
    corpus.  On a corpus with no true near-dups (this fixture) it
    surfaces the collision noise floor; with real duplicates those
    pairs pin to hamming 0-3 and the report becomes the dedup preview.
    Candidate generation stays the banded bucket-join (never
    all-pairs); the final order-by runs on the collision set, which is
    bucket-bounded, not corpus-sized."""
    pairs = media_phash_neardup(documents, max_hamming=64)
    return pairs.orderBy(
        F.col("hamming").asc(), F.col("doc_a").asc(), F.col("doc_b").asc()
    ).limit(k)
