"""Multimodal columns: images/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched pandas functions.

The Spark-side plumbing is real and tested: schema, partitioning,
``mapInPandas`` batch iteration, feature-vector output shape. The
default codec is a deterministic stand-in (``numpy.frombuffer`` over
the payload bytes) because no image/audio LIBRARIES ship in this
environment; the real-decoder path is ``register_decoder`` +
``extract_features(fake=False)``, and it is exercised end to end by
the pure-stdlib codecs in ``functions/codecs.py`` (binary PPM images,
PCM WAV audio — r11, closing the repo's last stub). ``fake=False``
with no registered decoder for a payload's kind raises
``NotImplementedError`` with instructions.

Scale notes: payloads ride through scans as opaque bytes (parquet keeps
them column-chunked; pruning a query that doesn't touch ``payload``
skips the bytes entirely). Feature extraction is mapInPandas so each
task processes Arrow record batches — tune batch row count via
``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are
MB-scale so a batch stays in executor memory. Decoded features are
small fixed-width vectors, so the expensive bytes never shuffle: filter
and aggregate on features, join back to payloads by key only when
re-materialization is genuinely needed.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datapipeline_gcp_spark.determinism import qround
from datapipeline_gcp_spark.schemas import load_testdata

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("declared_lang", T.StringType()),
                ]
            ),
        ),
    ]
)

#: Feature-row contract (shared by the fake and decoded arms):
#: ``byte_len`` = DECODED sample count (for float decoders this counts
#: every decoded sample, including non-finite ones the stats exclude);
#: ``mean_byte`` = mean over the samples the stats cover (finite samples
#: for float decoders); ``max_byte`` = max sample for integer-dtype
#: buffers, NULL for float decoders (a byte-scaled int of audio in
#: [-1, 1] truncates to a meaningless 0 — ADVICE r12); ``feature`` =
#: 8-bin normalized histogram (full dtype domain for ints, observed
#: finite range for floats). NULL stats mean "nothing to aggregate"
#: (empty or all-non-finite buffer), never fabricated zeros.
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("max_byte", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)

_KINDS = ("image", "audio", "video")


def assets_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic asset fixture: each document's UTF-8 bytes become
    an opaque payload with cycling modality and typed metadata."""
    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(*[F.lit(k) for k in _KINDS]),
            (F.pmod(F.col("doc_id"), F.lit(len(_KINDS))) + 1).cast("int"),
        ).alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
            F.col("lang").alias("declared_lang"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Decoder registry: the real-codec integration point
# ---------------------------------------------------------------------------

_DECODERS: dict[str, Callable] = {}


def register_decoder(kind: str, fn: Callable) -> None:
    """Install a real codec for a modality: ``fn(payload: bytes) ->
    numpy.ndarray``. E.g. PIL/libvips for images, soundfile for audio,
    PyAV frame sampling for video — none of those libraries ship in
    this build environment, so nothing is registered by default; the
    stdlib PPM/WAV codecs (``functions/codecs.py``) are the shipped
    real decoders, registered explicitly by the caller."""
    _DECODERS[kind] = fn


def decode_payload(kind: str, payload: bytes, fake: bool = True):
    """Decode one payload. With ``fake=True`` (the default here) the
    payload bytes themselves are treated as the decoded sample buffer —
    deterministic and library-free, keeping every downstream stage
    (feature extraction, resize, dedup-by-feature) real and testable.
    ``fake=False`` requires a registered real decoder."""
    import numpy as np

    if not fake:
        if kind not in _DECODERS:
            raise NotImplementedError(
                f"no real decoder registered for kind={kind!r}; install a codec "
                "library and call register_decoder(kind, fn). This environment "
                "ships no image/audio/video codecs (stub policy)."
            )
        return _DECODERS[kind](payload)
    return np.frombuffer(payload, dtype=np.uint8)


def extract_features(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Payload → feature vectors via Arrow-batched mapInPandas.

    The worker is a nested, fully self-contained closure: cloudpickle
    then serializes it BY VALUE, so executors never need this package on
    their PYTHONPATH — the engine's entry points must work when the
    caller imported it by file path (module-level functions pickle by
    reference and fail to import on the workers).

    ``fake=False`` routes every payload through the REAL decoders
    installed with :func:`register_decoder` (each asset's ``kind`` must
    have one — filter first). The repo's own pure-stdlib codecs
    (``functions/codecs.py``: binary PPM images, PCM WAV audio) are
    registered for by-value pickling at call time, so even the real
    path needs no package install on executors; decoders from OTHER
    modules follow standard pickling rules (their module must be
    importable worker-side). Feature semantics over a decoded array:
    ``byte_len`` = sample count, ``mean_byte``/``max_byte`` = sample
    stats, ``feature`` = 8-bin histogram normalized over the sample
    dtype's full domain (uint8 → [0,256), int16 → [-32768,32768)).
    """
    if not fake:
        return _extract_features_decoded(assets)
    feature_names = [f.name for f in FEATURE_SCHEMA.fields]

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # decode (fake codec) + 8-bin normalized byte histogram
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            rows = []
            for asset_id, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                if payload is None:  # absent/corrupt object: skip, don't die
                    continue
                buf = _np.frombuffer(bytes(payload), dtype=_np.uint8)
                if buf.size == 0:
                    # present-but-empty object: stats over zero bytes
                    # are undefined — NULL, not fabricated zeros (the
                    # repo-wide empty-aggregate rule; r10 blanktext
                    # sweep caught the old 0.0/0 arms diverging from
                    # the oracle's NULL)
                    rows.append(
                        {
                            "asset_id": int(asset_id),
                            "kind": kind,
                            "byte_len": 0,
                            "mean_byte": None,
                            "max_byte": None,
                            "feature": None,
                        }
                    )
                    continue
                hist = _np.histogram(buf, bins=8, range=(0, 256))[0]
                rows.append(
                    {
                        "asset_id": int(asset_id),
                        "kind": kind,
                        "byte_len": int(buf.size),
                        "mean_byte": float(buf.mean()),
                        "max_byte": int(buf.max()),
                        "feature": (hist / buf.size).astype(float).tolist(),
                    }
                )
            yield _pd.DataFrame(rows, columns=feature_names)

    return assets.mapInPandas(worker, schema=FEATURE_SCHEMA)


def _extract_features_decoded(assets: DataFrame) -> DataFrame:
    """The ``fake=False`` arm of :func:`extract_features`: decode with
    the REGISTERED codecs, then the same feature shape over decoded
    samples. The decoder dict is snapshotted into the closure at call
    time; the repo's own codecs module is registered for by-value
    pickling so the worker processes never import this package."""
    decoders = dict(_DECODERS)
    if not decoders:
        raise NotImplementedError(
            "fake=False requires at least one register_decoder(kind, fn) "
            "registration (see functions/codecs.py for the stdlib PPM/WAV "
            "decoders)"
        )
    try:  # by-value pickling for the engine's own stdlib codecs
        import cloudpickle

        from datapipeline_gcp_spark.functions import codecs as _codecs

        cloudpickle.register_pickle_by_value(_codecs)
    except Exception:  # cloudpickle API drift — fall back to by-reference
        pass
    feature_names = [f.name for f in FEATURE_SCHEMA.fields]

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            rows = []
            for asset_id, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                if payload is None:  # absent/corrupt object: skip
                    continue
                if kind not in decoders:
                    raise NotImplementedError(
                        f"no real decoder registered for kind={kind!r}; "
                        "filter assets to registered kinds or call "
                        "register_decoder first"
                    )
                buf = _np.asarray(decoders[kind](bytes(payload))).reshape(-1)
                if buf.size == 0:  # decoded-but-empty: NULL stats
                    rows.append(
                        {
                            "asset_id": int(asset_id),
                            "kind": kind,
                            "byte_len": 0,
                            "mean_byte": None,
                            "max_byte": None,
                            "feature": None,
                        }
                    )
                    continue
                # byte_len is ALWAYS the decoded sample count, before
                # any non-finite filtering — the float arm's stats may
                # cover fewer samples (ADVICE r12 convention, documented
                # at FEATURE_SCHEMA).
                n_decoded = int(buf.size)
                if _np.issubdtype(buf.dtype, _np.integer):
                    # integer samples (image rasters, PCM audio): the
                    # histogram spans the full dtype range so identical
                    # content yields identical features across batches;
                    # max_byte is the literal max sample
                    info = _np.iinfo(buf.dtype)
                    lo, hi = float(info.min), float(info.max) + 1.0
                    max_stat = int(buf.max())
                elif _np.issubdtype(buf.dtype, _np.floating):
                    # float-returning decoders (ADVICE r11: soundfile
                    # yields float64 by default) — np.iinfo would raise;
                    # bin over the observed FINITE range instead (a
                    # corrupt asset's NaN/inf samples must not kill the
                    # whole query — same convention as payload None /
                    # empty buffer: drop to NULL stats, keep going).
                    # Constant buffers get a degenerate range widened
                    # so histogram() doesn't divide by zero width.
                    # max_byte is NULL: int(max) of audio in [-1, 1]
                    # truncates to a meaningless 0 (ADVICE r12) and the
                    # column is byte-scaled by contract — float sample
                    # extrema live in `feature`'s observed-range bins.
                    buf = buf[_np.isfinite(buf)]
                    if buf.size == 0:  # all-non-finite: NULL stats
                        rows.append(
                            {
                                "asset_id": int(asset_id),
                                "kind": kind,
                                "byte_len": n_decoded,
                                "mean_byte": None,
                                "max_byte": None,
                                "feature": None,
                            }
                        )
                        continue
                    lo = float(buf.min())
                    hi = float(buf.max())
                    if not (lo < hi):
                        hi = lo + 1.0
                    max_stat = None
                else:
                    raise ValueError(
                        f"decoder for kind={kind!r} returned unsupported "
                        f"dtype {buf.dtype}; register_decoder functions "
                        "must return integer or float numpy arrays"
                    )
                hist = _np.histogram(buf, bins=8, range=(lo, hi))[0]
                rows.append(
                    {
                        "asset_id": int(asset_id),
                        "kind": kind,
                        "byte_len": n_decoded,
                        "mean_byte": float(buf.astype(_np.float64).mean()),
                        "max_byte": max_stat,
                        "feature": (hist / buf.size).astype(float).tolist(),
                    }
                )
            yield _pd.DataFrame(rows, columns=feature_names)

    return assets.mapInPandas(worker, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------


def multimodal_asset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata stats over the binary column — pure column ops
    (md5/length work on binary JVM-side), oracle-checked."""
    assets = assets_from_documents(spark, sf_dir)
    return assets.select(
        "asset_id",
        "kind",
        F.col("meta.source").alias("source"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5(F.col("payload")).alias("payload_md5"),
        F.length(F.col("payload")).cast("bigint").alias("payload_len"),
    )


_STATS_ORACLE = """
SELECT
  doc_id AS asset_id,
  ['image','audio','video'][(doc_id % 3) + 1] AS kind,
  source,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  md5(text) AS payload_md5,
  CAST(octet_length(encode(text)) AS BIGINT) AS payload_len
FROM documents
"""


N_BINS = 8  # histogram bins over byte values [0, 256) — bin = byte // 32


def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decode → feature pipeline (fake codec), projected to scalar
    columns for the driver gate: the verification harness canonicalizes
    rows with a pandas sort, which cannot hash an ``array<double>``
    column — so the registered query unnests ``feature`` into
    ``f0..f7`` (9-dp rounded) while ``extract_features`` keeps the
    array-returning API. The oracle reproduces the whole pipeline in
    SQL by slicing ``hex(encode(text))`` into per-byte integers —
    histogram counts and byte sums are exact integer math, so the
    9-dp-rounded doubles agree bit-for-bit."""
    feats = extract_features(assets_from_documents(spark, sf_dir))
    return feats.select(
        "asset_id",
        "kind",
        "byte_len",
        qround(F.col("mean_byte"), 9).alias("mean_byte"),
        "max_byte",
        *[
            qround(F.element_at(F.col("feature"), i + 1), 9).alias(f"f{i}")
            for i in range(N_BINS)
        ],
    )


# Bytes of the UTF-8 payload recovered engine-side: hex(encode(text))
# sliced into 2-char pairs → one BIGINT per byte. All downstream stats
# are integer-exact, divisions are single IEEE ops — deterministic.
_FEATURE_ORACLE = f"""
WITH raw AS (
  SELECT doc_id AS asset_id,
         ['image','audio','video'][(doc_id % 3) + 1] AS kind,
         hex(encode(text)) AS h
  FROM documents
  -- NULL payload = absent/corrupt object: the worker SKIPS the row
  -- (r7 bytes(None) fix) rather than emitting NULL features — a
  -- binary payload has no 'empty document' reading, unlike text
  WHERE text IS NOT NULL
),
b AS (
  SELECT asset_id, kind,
    list_transform(generate_series(1, length(h) // 2),
      i -> CAST(concat('0x', substr(h, 2*i - 1, 2)) AS BIGINT)) AS bytes
  FROM raw
)
SELECT
  asset_id,
  kind,
  CAST(len(bytes) AS BIGINT) AS byte_len,
  (floor(CAST(list_sum(bytes) AS DOUBLE) / len(bytes) * 1e9 + 0.5) / 1e9)
    AS mean_byte,
  CAST(list_max(bytes) AS BIGINT) AS max_byte,
  {", ".join(
    f"(floor(CAST(len(list_filter(bytes, x -> x // 32 = {k})) AS DOUBLE)"
    f" / len(bytes) * 1e9 + 0.5) / 1e9) AS f{k}"
    for k in range(N_BINS)
  )}
FROM b
"""

# ---------------------------------------------------------------------------
# Frame sampling: the video path's decode-and-sample plumbing
# ---------------------------------------------------------------------------

#: bytes per fake "frame" and the per-asset sampling cap
FRAME_W = 32
MAX_FRAMES = 8

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_offset", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(assets: DataFrame, kind: str = "video") -> DataFrame:
    """Frame sampling over binary video payloads: filter to the
    modality (column-pruned, pushed below the Python stage), then an
    Arrow-batched ``mapInPandas`` worker slices up to ``MAX_FRAMES``
    fixed-width frames per payload and emits one row per frame with a
    checksum and a mean-byte summary. A real deployment swaps the
    byte-slice "decode" for PyAV keyframe extraction via
    ``register_decoder`` — the Spark-side plumbing (binary column in,
    exploded frame rows out, per-batch vectorization, no shuffle at
    all) is exactly what ships.

    Scale shape: one narrow pipeline — parquet scan → filter → Python
    stage; output cardinality ≤ 8× the asset count and frames carry
    only scalars (the payload bytes never shuffle). ``mean_byte`` is an
    integer byte-sum with a single final division, so it is bitwise
    reproducible in any engine."""

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                n = min(len(b) // FRAME_W, MAX_FRAMES)
                for k in range(n):
                    fr = b[k * FRAME_W : (k + 1) * FRAME_W]
                    rows.append(
                        (
                            int(aid),
                            k,
                            k * FRAME_W,
                            float(sum(fr)) / FRAME_W,
                            # md5 of the canonical lowercase-hex form —
                            # engine-neutral (see resize_assets; DuckDB
                            # md5 cannot hash raw bytes)
                            hashlib.md5(fr.hex().encode()).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id",
                    "frame_idx",
                    "frame_offset",
                    "mean_byte",
                    "frame_md5",
                ],
            )

    return (
        assets.filter(F.col("kind") == kind)
        .select("asset_id", "payload")
        .mapInPandas(worker, FRAME_SCHEMA)
    )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(assets_from_documents(spark, sf_dir))


# kind cycles image/audio/video by doc_id mod 3, so video ⇔ doc_id%3=2;
# the fixture text is ASCII, so string positions = byte offsets and
# ord(char) = byte value, making the byte math expressible in SQL.
# BYTE-accurate like _RESIZE_ORACLE (r9 unicode sweep): frames are byte
# slices of the UTF-8 payload, indexed through the hex encoding
_FRAME_ORACLE = f"""
WITH assets AS (
  SELECT doc_id AS asset_id, lower(hex(encode(text))) AS hx,
         CAST(octet_length(encode(text)) AS BIGINT) AS n
  FROM documents WHERE doc_id % 3 = 2
),
frames AS (
  SELECT asset_id, k AS frame_idx, k * {FRAME_W} AS frame_offset,
         substring(hx, CAST(2 * k * {FRAME_W} + 1 AS INT), {2 * FRAME_W}) AS frhex
  FROM assets,
       UNNEST(range(0, LEAST(CAST(floor(n / {FRAME_W}) AS BIGINT),
                             {MAX_FRAMES}))) AS u(k)
)
SELECT asset_id, frame_idx, frame_offset,
       CAST(list_sum(list_transform(range(0, {FRAME_W}),
              i -> CAST(concat('0x', substring(frhex, CAST(2 * i + 1 AS INT), 2))
                        AS INT)))
            AS DOUBLE) / {FRAME_W} AS mean_byte,
       md5(frhex) AS frame_md5
FROM frames
"""


# ---------------------------------------------------------------------------
# Resize: fixed-size nearest-neighbor downsample of decoded buffers
# ---------------------------------------------------------------------------

RESIZE_TARGET = 16

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("orig_len", T.LongType()),
        T.StructField("resized_hex", T.StringType()),
        T.StructField("resized_md5", T.StringType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def resize_assets(assets: DataFrame, kind: str = "image") -> DataFrame:
    """Image-path resize plumbing: Arrow-batched ``mapInPandas`` that
    nearest-neighbor downsamples each decoded buffer to a fixed
    ``RESIZE_TARGET`` bytes (``out[i] = buf[(i·n)//T]`` — the 1-D
    analogue of NN image resize; a real deployment decodes with PIL
    via ``register_decoder`` and resizes H×W×C, same worker shape).
    Payloads shorter than the target are skipped inside the worker —
    the filter a real thumbnailer applies.

    Scale: scan → filter(kind) → Python stage, no shuffle; output rows
    carry ``RESIZE_TARGET`` bytes as hex plus scalars, so downstream
    stages (dedup by resized hash, embedding lookup) never touch the
    original payload. ``mean_byte`` is an exact integer sum with one
    final division."""

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import binascii
        import hashlib

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                n = len(b)
                if n < RESIZE_TARGET:
                    continue
                out = bytes(
                    b[(i * n) // RESIZE_TARGET] for i in range(RESIZE_TARGET)
                )
                out_hex = binascii.hexlify(out).decode()
                rows.append(
                    (
                        int(aid),
                        n,
                        out_hex,
                        # md5 of the canonical lowercase-hex serialization
                        # (not the raw bytes): DuckDB's md5 only hashes
                        # VARCHAR, and arbitrary bytes are not valid
                        # UTF-8 — hashing the hex form is engine-neutral
                        # and equally collision-resistant (r9 unicode
                        # sweep: the byte/char split made the old
                        # char-indexed oracle wrong on multi-byte text)
                        hashlib.md5(out_hex.encode()).hexdigest(),
                        float(sum(out)) / RESIZE_TARGET,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id",
                    "orig_len",
                    "resized_hex",
                    "resized_md5",
                    "mean_byte",
                ],
            )

    return (
        assets.filter(F.col("kind") == kind)
        .select("asset_id", "payload")
        .mapInPandas(worker, RESIZE_SCHEMA)
    )


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resize_assets(assets_from_documents(spark, sf_dir))


# image ⇔ doc_id%3=0. BYTE-accurate (r9 unicode sweep): the payload is
# the document's UTF-8 BYTES, so the oracle indexes the hex encoding
# (byte i = hex[2i+1..2i+2]) instead of character positions — on
# multi-byte text those are different things and the engine's
# byte-indexed resize is the honest multimodal semantics.
_RESIZE_ORACLE = f"""
WITH assets AS (
  SELECT doc_id AS asset_id, lower(hex(encode(text))) AS hx,
         CAST(octet_length(encode(text)) AS BIGINT) AS n
  FROM documents
  WHERE doc_id % 3 = 0 AND octet_length(encode(text)) >= {RESIZE_TARGET}
),
resized AS (
  SELECT asset_id, n,
         array_to_string(list_transform(range(0, {RESIZE_TARGET}),
           i -> substring(hx, CAST(2 * ((i * n) // {RESIZE_TARGET}) + 1 AS INT), 2)),
           '') AS outhex
  FROM assets
)
SELECT asset_id, n AS orig_len,
       outhex AS resized_hex,
       md5(outhex) AS resized_md5,
       CAST(list_sum(list_transform(range(0, {RESIZE_TARGET}),
              i -> CAST(concat('0x', substring(outhex, CAST(2 * i + 1 AS INT), 2))
                        AS INT))) AS DOUBLE)
         / {RESIZE_TARGET} AS mean_byte
FROM resized
"""


# ---------------------------------------------------------------------------
# Perceptual-hash dedup: aHash over the resized buffer
# ---------------------------------------------------------------------------

AHASH_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("ahash", T.LongType()),
    ]
)


def ahash_stage(df: DataFrame, passthrough: tuple[str, ...] = ()) -> DataFrame:
    """The aHash map stage shared by batch phash dedup and the streaming
    multimodal ingest gate: ``(asset_id, payload, *passthrough)`` →
    ``(asset_id, *passthrough, ahash)`` via Arrow-batched mapInPandas.
    Bit *i* of the 16-bit hash is set iff ``resized[i] > mean(resized)``
    over the ``RESIZE_TARGET``-byte downsample; payloads shorter than
    the target emit NO row (nothing to hash).

    This is THE payload boundary: downstream of this stage only 8-byte
    hashes (plus the named passthrough columns) exist, so no shuffle —
    batch aggregation or streaming dedup state — ever moves image
    bytes. Works unchanged on a streaming DataFrame (mapInPandas is
    stream-capable), which is how the ingest gate composes it."""
    fields = [T.StructField("asset_id", T.LongType())]
    fields += [df.schema[c] for c in passthrough]
    fields += [T.StructField("ahash", T.LongType())]
    out_schema = T.StructType(fields)
    cols = list(passthrough)
    target = RESIZE_TARGET

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for idx in range(len(pdf)):
                raw = pdf["payload"].iloc[idx]
                if raw is None:
                    continue
                b = bytes(raw)
                n = len(b)
                if n < target:
                    continue
                out = [b[(i * n) // target] for i in range(target)]
                mean = sum(out) / target
                h = 0
                for i, v in enumerate(out):
                    if v > mean:
                        h |= 1 << i
                rows.append(
                    (int(pdf["asset_id"].iloc[idx]),)
                    + tuple(pdf[c].iloc[idx] for c in cols)
                    + (h,)
                )
            yield pd.DataFrame(rows, columns=["asset_id", *cols, "ahash"])

    return df.mapInPandas(worker, out_schema)


def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash dedup for the image path: average-hash (aHash)
    over the ``RESIZE_TARGET``-byte downsample — bit *i* set iff
    ``resized[i] > mean(resized)`` — then exact grouping on the 16-bit
    hash. This is the multimodal twin of text exact-dedup: identical
    (and, with a real decoder, *visually* identical) images collapse
    to one hash with NO pairwise comparison — corpus-linear, exactly
    like the MinHash family. Fixture plants exact copies of every 6th
    image at id+3,000,000; the oracle reproduces the byte math, so
    group membership is hash-checked end to end.

    Returns (asset_id, ahash, n_same, keep) — ``keep`` is keep-first
    by id within the hash group. At 100 TB: the Python stage emits 8
    bytes per image; the dedup aggregation never touches payloads.
    """
    assets = assets_from_documents(spark, sf_dir).filter(
        F.col("kind") == "image"
    )
    planted = assets.filter(F.col("asset_id") % 6 == 0).withColumn(
        "asset_id", F.col("asset_id") + 3_000_000
    )
    allv = assets.unionAll(planted).select("asset_id", "payload")
    hashed = ahash_stage(allv)
    groups = hashed.groupBy("ahash").agg(
        F.count("*").alias("n_same"),
        F.min("asset_id").alias("keep_id"),
    )
    return hashed.join(groups, "ahash").select(
        "asset_id",
        "ahash",
        "n_same",
        (F.col("asset_id") == F.col("keep_id")).alias("keep"),
    )


# The assets→allv→resized→hashed CTE chain is shared between the batch
# dedup oracle and the streaming ingest gate's oracle (streaming/e2e.py)
# — one definition so the two can never drift.
# byte-accurate via the hex encoding, like _RESIZE_ORACLE (r9 unicode)
PHASH_HASHED_CTES = f"""assets AS (
  SELECT doc_id AS asset_id, lower(hex(encode(text))) AS hx,
         CAST(octet_length(encode(text)) AS BIGINT) AS n
  FROM documents
  WHERE doc_id % 3 = 0 AND octet_length(encode(text)) >= {RESIZE_TARGET}
),
allv AS (
  SELECT asset_id, hx, n FROM assets
  UNION ALL
  SELECT asset_id + 3000000, hx, n FROM assets WHERE asset_id % 6 = 0
),
resized AS (
  SELECT asset_id,
         list_transform(range(0, {RESIZE_TARGET}),
           i -> CAST(concat('0x', substring(hx,
                CAST(2 * ((i * n) // {RESIZE_TARGET}) + 1 AS INT), 2))
                AS INT)) AS ob
  FROM allv
),
hashed AS (
  SELECT asset_id,
    CAST(list_sum(list_transform(range(0, {RESIZE_TARGET}), i ->
      CASE WHEN ob[i + 1] > CAST(list_sum(ob) AS DOUBLE) / {RESIZE_TARGET}
           THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS ahash
  FROM resized
)"""

_PHASH_ORACLE = f"""
WITH {PHASH_HASHED_CTES},
groups AS (
  SELECT ahash, CAST(COUNT(*) AS BIGINT) AS n_same,
         MIN(asset_id) AS keep_id
  FROM hashed GROUP BY ahash
)
SELECT h.asset_id, h.ahash, g.n_same, h.asset_id = g.keep_id AS keep
FROM hashed h JOIN groups g USING (ahash)
"""


#: 2024-01-01T00:00:00Z — the streaming fixture's event-time base
PHASH_TS_EPOCH = 1_704_067_200


def phash_stream_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(asset_id, ts, payload) fixture for the streaming multimodal
    ingest gate (``streaming/e2e.py``): the exact batch phash-dedup
    population — images plus planted copies of every 6th at +3,000,000
    (same planting as :func:`multimodal_phash_dedup`, so the shared
    ``PHASH_HASHED_CTES`` oracle covers both) — with a deterministic
    event-time spread inside one watermark window (≤ 1 h spread vs the
    2 h dedup watermark: no fixture row can be dropped as late)."""
    assets = assets_from_documents(spark, sf_dir).filter(
        F.col("kind") == "image"
    )
    planted = assets.filter(F.col("asset_id") % 6 == 0).withColumn(
        "asset_id", F.col("asset_id") + 3_000_000
    )
    return assets.unionAll(planted).select(
        "asset_id",
        F.timestamp_seconds(
            F.lit(PHASH_TS_EPOCH) + F.pmod(F.col("asset_id"), F.lit(3600))
        ).alias("ts"),
        "payload",
    )


QUERIES = {
    "multimodal_asset_stats": multimodal_asset_stats,
    "multimodal_feature_extract": multimodal_feature_extract,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_resize": multimodal_resize,
    "multimodal_phash_dedup": multimodal_phash_dedup,
}

ORACLES = {
    "multimodal_asset_stats": _STATS_ORACLE,
    "multimodal_feature_extract": _FEATURE_ORACLE,
    "multimodal_frame_sample": _FRAME_ORACLE,
    "multimodal_resize": _RESIZE_ORACLE,
    "multimodal_phash_dedup": _PHASH_ORACLE,
}
