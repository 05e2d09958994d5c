"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema contracts, Arrow-batched
``mapInPandas`` iteration, partition sizing, deterministic frame sampling.
The actual codec work (Pillow/ffmpeg/torchaudio) is stubbed behind
``_HAS_CODECS``: this container has no media libraries, so ``decode``
raises ``NotImplementedError`` unless ``fake=True``, which runs a
deterministic fake decoder (dimensions/features derived from the payload
bytes) exercising the identical batch path.

Scale notes: media payloads dominate row size, so operators here
- never shuffle payload bytes (feature extraction projects them away
  before any wide transformation),
- bound Arrow batch memory with ``spark.sql.execution.arrow.
  maxRecordsPerBatch`` (set it so batch_size x avg_payload fits the
  executor), and
- sample frames/clips inside the UDF (per-row fan-out happens AFTER the
  payload is already local to the worker).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not installed in this environment
    from PIL import Image  # noqa: F401

    _HAS_CODECS = True
except ImportError:
    _HAS_CODECS = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("source_uri", T.StringType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _make_fake_decode():
    """Deterministic stand-in for a codec: dims + an 8-dim feature derived
    from the payload digest. Same bytes -> same output on every executor.

    Built as a NESTED function so cloudpickle ships it by value inside the
    UDF closure: executors' Python workers may not have this package on
    their import path (e.g. a verification driver running from another
    cwd), and a module-level function would pickle as an import reference.
    """

    def fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
        import hashlib as _hashlib

        d = _hashlib.sha256(payload or b"").digest()
        width = 64 + d[0] % 192
        height = 64 + d[1] % 192
        feature = [b / 255.0 for b in d[2:10]]
        return width, height, feature

    return fake_decode


_fake_decode = _make_fake_decode()


def _make_real_decode():
    """Pillow-backed image decode: true dimensions + a 12-dim feature (the
    RGB values of a 2x2 thumbnail, normalized) — deterministic for a given
    payload. Audio/video kinds yield metadata-only rows (null dims, empty
    feature): those codecs (ffmpeg/torchaudio) stay out of scope, and a
    silent wrong answer would be worse than an explicit partial one.

    Nested def for the same cloudpickle-by-value reason as the fake."""

    def real_decode(payload: bytes, kind: str):
        if kind != "image" or not payload:
            return None, None, []
        import io as _io

        from PIL import Image as _Image

        with _Image.open(_io.BytesIO(payload)) as img:
            width, height = img.size
            thumb = img.convert("RGB").resize((2, 2))
            feature = [v / 255.0 for px in thumb.getdata() for v in px]
        return width, height, feature

    return real_decode


def _make_header_decode():
    """Stdlib-only container-header parse: true dimensions from PNG IHDR,
    GIF logical-screen, or JPEG SOF markers — no codec library, no pixel
    decode, feature always []. The dimensions-only contract (corpus
    filtering by resolution, aspect-ratio stats) therefore has standing
    evidence even where Pillow is absent; full pixel features still
    require the real codec path.

    Nested def for the same cloudpickle-by-value reason as the fake."""

    def header_decode(payload: bytes, kind: str):
        if kind != "image" or not payload:
            return None, None, []
        import struct as _struct

        b = bytes(payload)
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
            w, h = _struct.unpack(">II", b[16:24])
            return int(w), int(h), []
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            w, h = _struct.unpack("<HH", b[6:10])
            return int(w), int(h), []
        if b[:2] == b"\xff\xd8":  # JPEG: walk segments to a SOFn
            sof = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
            i = 2
            while i + 1 < len(b) and b[i] == 0xFF:
                marker = b[i + 1]
                if marker == 0xFF:  # fill bytes: any run of FF may pad a marker
                    i += 1
                    continue
                if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone markers carry no length field
                    continue
                if marker in sof:
                    # SOF payload: len(2) precision(1) height(2) width(2)
                    if i + 9 > len(b):  # truncated before the dims
                        break
                    h, w = _struct.unpack(">HH", b[i + 5 : i + 9])
                    return int(w), int(h), []
                if i + 4 > len(b):
                    break
                i += 2 + _struct.unpack(">H", b[i + 2 : i + 4])[0]
        return None, None, []

    return header_decode


def decode_media(
    df: DataFrame,
    fake: bool = False,
    batch_size: int = 64,
    headers_only: bool = False,
) -> DataFrame:
    """Decode/feature-extract media rows via Arrow-batched mapInPandas.

    ``fake=True`` uses the deterministic fake codec (tests, this
    environment); ``headers_only=True`` parses REAL dimensions from the
    container headers with the stdlib only (PNG/GIF/JPEG — feature stays
    empty; see :func:`_make_header_decode`); otherwise Pillow decodes
    image rows for real (audio and video rows pass through metadata-only
    — see :func:`_make_real_decode`) and the call raises if Pillow is
    unavailable.
    """
    if not fake and not headers_only and not _HAS_CODECS:
        raise NotImplementedError(
            "media codecs (Pillow) not available in this environment; "
            "pass headers_only=True for stdlib dimension parsing or "
            "fake=True for the deterministic stub decoder"
        )

    # nested defs => pickled by value into the UDF closure
    if fake:
        decode = _make_fake_decode()
    elif headers_only:
        decode = _make_header_decode()
    else:
        decode = _make_real_decode()
    use_fake = fake

    # batch_size bounds the DECODE working set by re-chunking each Arrow
    # batch inside the iterator, instead of mutating the session-global
    # arrow.maxRecordsPerBatch at plan-build time (which throttled every
    # OTHER Arrow operation in the session and raced between decode
    # frames built with different sizes — review finding). Arrow's own
    # input batch size stays whatever the session configures.
    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for whole in batches:
            for lo in range(0, len(whole), batch_size):
                pdf = whole.iloc[lo : lo + batch_size]
                out = {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [],
                    "height": [],
                    "n_bytes": [],
                    "feature": [],
                }
                for payload, kind in zip(pdf["payload"], pdf["kind"]):
                    raw = bytes(payload) if payload is not None else b""
                    if use_fake:
                        w, h, feat = decode(raw)
                    else:
                        w, h, feat = decode(raw, kind)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_bytes"].append(len(raw))
                    out["feature"].append(feat)
                yield pd.DataFrame(out)

    # Project to exactly the columns the decoder touches BEFORE the Arrow
    # boundary: Spark cannot see inside the Python function, so without
    # this every input column (mime, source_uri, ...) is read from
    # storage, transposed to Arrow and shipped to the Python worker just
    # to be dropped by the output schema (guide: opaque functions defeat
    # column pruning — select first).
    return df.select("media_id", "kind", "payload").mapInPandas(
        decode_batches, schema=DECODED_SCHEMA
    )


def sample_frames(df: DataFrame, every_n: int = 10, n_frames_col: str = "n_frames") -> DataFrame:
    """Deterministic frame-index sampling for video rows: explode frame
    indices 0, n, 2n, ... as a pure expression (the decode of each sampled
    frame then happens payload-local inside the UDF stage). Rows with
    n_frames <= 0 (empty/corrupt video) emit ZERO frames — the naive
    sequence(0, n-1) throws 'illegal sequence boundaries' for the whole
    job on the first such row (review finding)."""
    safe_end = F.greatest(F.col(n_frames_col) - 1, F.lit(0))
    idx = F.filter(
        F.sequence(F.lit(0), safe_end, F.lit(every_n)),
        lambda _i: F.col(n_frames_col) >= 1,
    )
    return df.withColumn("frame_index", F.explode(idx))


def media_stats(df: DataFrame) -> DataFrame:
    """Cheap metadata pass that never decodes: payload sizes per kind."""
    return (
        df.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.max(F.length("payload")).alias("max_bytes"),
        )
        .orderBy("kind")
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("window_idx", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zero_crossings", T.IntegerType(), False),
    ]
)


def audio_window_features(
    df: DataFrame,
    window_samples: int = 1024,
    batch_size: int = 64,
) -> DataFrame:
    """Windowed audio features over raw PCM16-LE mono payloads: per
    window, RMS energy (normalized to [-1, 1] full scale) and
    zero-crossing count — the classic cheap speech/music/silence
    discriminators a corpus filter runs before any model.

    Unlike image/video decode this needs NO codec: PCM interpretation of
    the payload bytes is pure arithmetic (numpy int16 view), so this is a
    REAL computation, not a stub — encoded formats (mp3/ogg) would insert
    the stubbed decode step first. Same scale shape as decode_media: the
    payload never shuffles (features project it away inside the UDF), the
    per-row window fan-out happens after the payload is worker-local, and
    the feature working set is bounded by ``batch_size`` re-chunking
    inside the iterator."""
    import numpy as np

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for whole in batches:
            # per-chunk yields bound the feature working set without
            # mutating the session-global Arrow batch conf (see
            # decode_media)
            chunks = (
                whole.iloc[lo : lo + batch_size]
                for lo in range(0, len(whole), batch_size)
            )
            yield from _audio_chunk_frames(chunks)

    def _audio_chunk_frames(chunks):
        for pdf in chunks:
            ids, widx, nsamp, rms, zc = [], [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                samples = np.frombuffer(
                    raw[: len(raw) - (len(raw) % 2)], dtype="<i2"
                ).astype(np.float64) / 32768.0
                for w in range(0, max(len(samples), 1), window_samples):
                    chunk = samples[w : w + window_samples]
                    ids.append(media_id)
                    widx.append(w // window_samples)
                    nsamp.append(len(chunk))
                    if len(chunk):
                        rms.append(float(np.sqrt(np.mean(chunk * chunk))))
                        zc.append(int(np.sum(np.signbit(chunk[1:]) != np.signbit(chunk[:-1]))))
                    else:
                        rms.append(None)
                        zc.append(0)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(widx, dtype="int32"),
                    "n_samples": pd.Series(nsamp, dtype="int32"),
                    "rms": pd.Series(rms, dtype="float64"),
                    "zero_crossings": pd.Series(zc, dtype="int32"),
                }
            )

    return df.filter(F.col("kind") == "audio").select("media_id", "payload").mapInPandas(
        feature_batches, schema=AUDIO_FEATURES_SCHEMA
    )
