"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
transforms (BASELINE.json north-star additions).

The ``real=True`` decode paths are REAL for six production formats —
PNG (all five scanline filters), GIF (real LZW, palettes,
interlace), netpbm P5/P6, uncompressed BMP, RIFF/WAV PCM, and
uncompressed AVI video — implemented in pure stdlib + numpy in
``functions/codecs.py`` (no PIL, no ffmpeg needed). Only *inter-frame* video codecs (H.264 etc.) remain
environmental: ``sample_video_frames(real=True)`` raises with a
pointer to :func:`decode_video_frames` (the real AVI path) and the
fake byte-slicing twin exercises the identical plan shape. The fake
kernels are kept alongside the real ones because the registered
oracle queries m1-m4 pin THEIR deterministic arithmetic; m5/m6/m7
pin the real decoders against analytic oracles.

Schema convention for a multimodal asset column::

    payload   BINARY            -- the opaque bytes
    media_type STRING           -- 'image/png', 'audio/wav', ...
    meta      STRUCT<width INT, height INT, n_bytes BIGINT, ...>

Scale notes: binary payloads dominate partition size — repartition by
``spark.sql.files.maxPartitionBytes`` at read, and NEVER collect
payloads to the driver. mapInPandas streams Arrow batches, so peak
executor memory is one batch of payloads, not one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "width int, height int, n_bytes bigint, format string"
)


def attach_binary_payload(
    df: DataFrame, source_col: str, media_type: str = "application/octet-stream"
) -> DataFrame:
    """Stand-in asset producer: encode a string column to bytes and tag
    it with a media type (real pipelines read payloads via
    ``spark.read.format('binaryFile')``)."""
    return df.withColumn(
        "payload", F.encode(F.col(source_col), "UTF-8")
    ).withColumn("media_type", F.lit(media_type))


def read_binary_assets(spark, path: str, glob: str = "*") -> DataFrame:
    """Real binary-asset scan: one row per file with path, mtime,
    length, content (the production entry point for image/audio dirs).
    """
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def sniff_media_type_col(payload_col: str = "payload"):
    """Magic-byte media-type sniff as PURE column expressions — the
    JVM-side twin of ``functions/codecs.sniff_format``, for routing
    payloads to per-format decode kernels without any Python in the
    plan. At 100 TB the router runs in whole-stage codegen over the
    scan; only the rows of each format reach their (Arrow-batched)
    decoder.

    The WHEN chain is BUILT FROM the codec module's ``_MAGIC`` table
    and ``MEDIA_TYPES`` map (plus the two RIFF subtypes, which need a
    second probe at offset 9), so adding a format to the Python
    sniffer automatically extends this router — the two cannot
    drift, and a pin test cross-checks them on every format.

    Returns a Column yielding the IANA media type or
    'application/octet-stream'.
    """
    from garmin_data_pipeline_spark.functions.codecs import (
        _MAGIC,
        MEDIA_TYPES,
    )

    p = F.col(payload_col)

    def starts(prefix: bytes):
        return F.substring(p, 1, len(prefix)) == F.lit(prefix)

    expr = None
    for magic, name in _MAGIC:
        clause = (starts(magic), F.lit(MEDIA_TYPES[name]))
        expr = F.when(*clause) if expr is None else expr.when(*clause)
    riff_kind = F.substring(p, 9, 4)
    for kind, name in ((b"WAVE", "wav"), (b"AVI ", "avi")):
        expr = expr.when(
            starts(b"RIFF") & (riff_kind == F.lit(kind)),
            F.lit(MEDIA_TYPES[name]),
        )
    return expr.otherwise(F.lit("application/octet-stream"))


def fake_decode_image_meta(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for an image decoder: derives fake
    dimensions from the payload bytes. Replace with PIL.Image.open for
    real decoding — the surrounding plumbing is unchanged."""
    n = len(payload)
    checksum = sum(payload[:64]) if n else 0
    width = 16 + (checksum % 64)
    height = 16 + (n % 64)
    return width, height, n, "fake"


def decode_image_metadata(
    df: DataFrame, payload_col: str = "payload", real: bool = False
) -> DataFrame:
    """Extract image metadata from binary payloads via mapInPandas
    (Arrow-batched; the pattern for any decode/feature-extract kernel).

    ``real=True`` runs the REAL pure-stdlib/numpy decoders
    (``functions/codecs.py``: PNG / netpbm / BMP — width and height
    come from an actual pixel decode, not the header alone, so a
    truncated raster reads as corrupt). Undecodable payloads yield
    NULL width/height and format ``'unknown'`` instead of failing the
    job — a 100 TB crawl always contains corrupt files; filter on
    ``format`` downstream.
    """
    in_cols = df.columns
    out_schema = ", ".join(
        [f"{c} {t}" for c, t in zip(df.schema.fieldNames(), _ddl_types(df))]
        + ["width int", "height int", "n_bytes bigint", "format string"]
    )

    def decode_one(p: bytes) -> tuple:
        if real:
            try:
                from garmin_data_pipeline_spark.functions.codecs import (
                    image_meta,
                )

                return image_meta(p)
            except ValueError:
                return None, None, len(p), "unknown"
        return fake_decode_image_meta(p)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                decode_one(bytes(p) if p is not None else b"")
                for p in pdf[payload_col]
            ]
            meta_df = pd.DataFrame(
                metas, columns=["width", "height", "n_bytes", "format"],
                index=pdf.index,
            )
            yield pd.concat([pdf[in_cols], meta_df], axis=1)

    return df.mapInPandas(kernel, schema=out_schema)


def _ddl_types(df: DataFrame) -> list[str]:
    return [f.dataType.simpleString() for f in df.schema.fields]


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    real: bool = False,
) -> DataFrame:
    """Resize kernel over mapInPandas (1 row -> 1 row, payload
    rewritten, meta updated).

    ``real=True`` runs a REAL nearest-neighbor resize: decode the
    payload with the pure-stdlib/numpy codecs (PNG/netpbm/BMP),
    resample on the standard integer sample grid, re-encode in the
    SAME format. Undecodable payloads pass through with NULL
    width/height (corrupt files must not fail a 100 TB job). The fake
    path truncates/zero-pads the payload to width*height bytes, which
    exercises the same plumbing concern — Arrow-batched binary
    rewrite with a changed payload size profile.
    """
    target = width * height
    in_cols = df.columns
    out_schema = ", ".join(
        f"{c} {t}" for c, t in zip(df.schema.fieldNames(), _ddl_types(df))
    ) + ", width int, height int"

    def resize_one(p: bytes) -> tuple:
        import numpy as np

        from garmin_data_pipeline_spark.functions import codecs

        try:
            fmt = codecs.sniff_format(p)
            if fmt == "gif":
                # resize EVERY frame — re-encoding only frame 0 would
                # silently destroy the rest of an animation. Exact
                # palettization over the union of resized frames
                # (nearest-neighbor invents no colors); >256 colors
                # (multiple local palettes) passes through untouched.
                _meta, frames = codecs.decode_gif(p)
                resized = np.stack(
                    [
                        codecs.resize_nearest(f, width, height)
                        for f in frames
                    ]
                )
                colors, inv = np.unique(
                    resized.reshape(-1, 3), axis=0, return_inverse=True
                )
                if colors.shape[0] > 256:
                    return p, None, None
                pal_size = 1 << max(1, (colors.shape[0] - 1).bit_length())
                pal = np.zeros((pal_size, 3), dtype=np.uint8)
                pal[: colors.shape[0]] = colors
                idx = inv.astype(np.uint8).reshape(resized.shape[:3])
                return codecs.encode_gif(idx, pal), width, height
            arr, fmt = codecs.decode_image(p)
            return codecs.encode_image(
                codecs.resize_nearest(arr, width, height), fmt
            ), width, height
        except ValueError:
            return p, None, None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[in_cols].copy()
            if real:
                triples = [
                    resize_one(bytes(p) if p is not None else b"")
                    for p in pdf[payload_col]
                ]
                pdf[payload_col] = [t[0] for t in triples]
                pdf["width"] = pd.array(
                    [t[1] for t in triples], dtype="Int32"
                )
                pdf["height"] = pd.array(
                    [t[2] for t in triples], dtype="Int32"
                )
            else:
                pdf[payload_col] = [
                    (p or b"")[:target].ljust(target, b"\0")
                    for p in pdf[payload_col]
                ]
                pdf["width"] = width
                pdf["height"] = height
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    frame_size: int = 256,
    every_n: int = 2,
    payload_col: str = "payload",
    real: bool = False,
) -> DataFrame:
    """Frame sampling: one input row -> N frame rows, entirely JVM-side.

    The *decoder* is stubbed (``real=True`` raises — no ffmpeg here):
    a fake "video" is its payload split into fixed ``frame_size``-byte
    frames, keeping every ``every_n``-th. Frame indexes come from an
    exploded ``sequence`` and each frame is a ``substring`` slice of
    the BinaryType payload — no Python in the plan at all, so the
    payload crosses no serialization boundary (an earlier mapInPandas
    slice shipped the full payload into Python once per exploded frame
    row: O(payload_bytes x n_frames) Arrow transfer). A real per-frame
    decode kernel plugs in downstream via :func:`decode_frames`, which
    sees only the already-sliced frame bytes — O(payload_bytes) total.
    """
    if real:
        raise NotImplementedError(
            "sample_video_frames is the byte-domain slicer; REAL frame "
            "decode exists for uncompressed AVI via decode_video_frames "
            "(pure stdlib/numpy RIFF+DIB, certified by m7) — only "
            "INTER-FRAME codecs (H.264 etc.) genuinely need ffmpeg; "
            "plug such a kernel in via decode_frames() over the slices"
        )
    in_cols = [c for c in df.columns if c != payload_col]

    # Frame arithmetic is pure math — explode a sequence of sampled
    # frame indexes, then slice JVM-side. Empty payloads have zero
    # frames, i.e. emit no rows. substring on BinaryType is 1-based and
    # clamps at the payload end, so the last frame runs short exactly
    # like the oracle's LEAST(frame_size, n_bytes - idx*frame_size).
    n_bytes = F.length(F.col(payload_col))
    n_frames = F.ceil(n_bytes / F.lit(frame_size))
    return (
        df.filter(n_bytes > 0)
        .withColumn(
            "frame_idx",
            F.explode(
                F.sequence(
                    F.lit(0).cast("bigint"),
                    (n_frames - 1).cast("bigint"),
                    F.lit(every_n).cast("bigint"),
                )
            ),
        )
        .select(
            *in_cols,
            "frame_idx",
            F.expr(
                f"substring({payload_col}, "
                f"frame_idx * {frame_size} + 1, {frame_size})"
            ).alias("frame"),
            F.least(
                F.lit(frame_size).cast("bigint"),
                F.length(F.col(payload_col)).cast("bigint")
                - F.col("frame_idx") * frame_size,
            ).alias("frame_len"),
        )
    )


def window_audio(
    df: DataFrame,
    window_bytes: int = 512,
    hop_bytes: int = 256,
    payload_col: str = "payload",
    real: bool = False,
) -> DataFrame:
    """Overlapping audio windowing: one input row -> one row per
    analysis window (the STFT/feature-extraction front end of an
    audio pipeline), entirely JVM-side.

    The *decoder* is stubbed (``real=True`` raises — no audio codecs
    here): a fake "waveform" is the raw payload, windowed into
    ``window_bytes`` slices every ``hop_bytes`` (hop < window =
    overlap, exactly like the token chunker's stride). Same plan shape
    as :func:`sample_video_frames`: window starts come from an
    exploded ``sequence``, each window is a ``substring`` slice of the
    BinaryType payload — no Python in the plan, O(payload x
    window/hop) total bytes, and a real PCM/feature kernel plugs in
    downstream via :func:`decode_frames` over the sliced windows.
    Window starts are emitted while they contribute new bytes
    (start < n_bytes - (window - hop), plus a first window for short
    payloads) — the chunker's no-redundant-tail rule.
    """
    if real:
        raise NotImplementedError(
            "window_audio is the byte-domain slicer by design; for "
            "REAL sample-domain windowing of PCM WAV payloads use "
            "window_audio_frames (header-parse kernel + JVM slicing) "
            "or decode_audio_features (full decode + exact stats)"
        )
    if hop_bytes <= 0 or hop_bytes > window_bytes:
        raise ValueError("need 0 < hop_bytes <= window_bytes")
    in_cols = [c for c in df.columns if c != payload_col]
    overlap = window_bytes - hop_bytes
    n_bytes = F.length(F.col(payload_col))
    return (
        df.filter(n_bytes > 0)
        .withColumn(
            "window_start",
            F.explode(
                F.sequence(
                    F.lit(0).cast("bigint"),
                    F.greatest(
                        (n_bytes - overlap - 1).cast("bigint"),
                        F.lit(0).cast("bigint"),
                    ),
                    F.lit(hop_bytes).cast("bigint"),
                )
            ),
        )
        .select(
            *in_cols,
            (F.col("window_start") / hop_bytes)
            .cast("bigint")
            .alias("window_idx"),
            F.expr(
                f"substring({payload_col}, "
                f"window_start + 1, {window_bytes})"
            ).alias("window"),
            F.least(
                F.lit(window_bytes).cast("bigint"),
                n_bytes.cast("bigint") - F.col("window_start"),
            ).alias("window_len"),
        )
    )


def decode_frames(
    df: DataFrame,
    kernel,
    out_schema: str,
    frame_col: str = "frame",
) -> DataFrame:
    """Run an Arrow-batched decode kernel over already-sliced frames
    (the plug-in point for a real ffmpeg/PIL per-frame decode).

    ``kernel(pdf) -> pdf`` maps one pandas batch to one pandas batch.
    Because :func:`sample_video_frames` slices JVM-side, only the frame
    bytes — not the whole payload — cross the Arrow boundary here.
    """

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield kernel(pdf)

    return df.mapInPandas(mapper, schema=out_schema)


def checksum_frames(
    df: DataFrame, frame_col: str = "frame"
) -> DataFrame:
    """Deterministic per-frame decode: md5 of each frame's bytes,
    run THROUGH :func:`decode_frames` — i.e. this is the canned fake
    codec that exercises the real Arrow decode boundary end-to-end
    (slice JVM-side, ship only frame bytes to Python, one batch in ->
    one batch out). A real ffmpeg/PIL kernel replaces the md5 line
    and nothing else changes.

    Output: the input columns minus ``frame_col``, plus
    ``frame_md5 string``. md5 is computed over raw bytes, so it is
    payload-exact for any corpus (the SQL oracle's VARCHAR md5 only
    coincides for ASCII payloads — documented there, not here).
    """
    keep = [c for c in df.columns if c != frame_col]
    keep_types = {
        f.name: f.dataType.simpleString() for f in df.schema.fields
    }
    out_schema = ", ".join(
        [f"{c} {keep_types[c]}" for c in keep] + ["frame_md5 string"]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        out = pdf[keep].copy()
        out["frame_md5"] = [
            hashlib.md5(
                bytes(b) if b is not None else b""
            ).hexdigest()
            for b in pdf[frame_col]
        ]
        return out

    return decode_frames(df, kernel, out_schema, frame_col)


def decode_video_frames(
    df: DataFrame, payload_col: str = "payload", every_n: int = 1
) -> DataFrame:
    """REAL video frame decode for uncompressed AVI and animated GIF
    payloads (``functions/codecs.decode_video`` — pure stdlib/numpy:
    RIFF walk + DIB frames for AVI, LZW + palette compositing for
    GIF, routed by magic bytes; inter-frame codecs raise and need
    ffmpeg).

    One input row -> one row per sampled frame (every ``every_n``-th),
    with exact integer pixel statistics per frame:

    ``frame_idx bigint, width int, height int, n_frames bigint,
    px_sum bigint``

    Undecodable payloads emit a single row with NULL stats (corrupt
    files must not fail the job; filter ``n_frames IS NULL`` to
    audit). The kernel is Arrow-batched mapInPandas: peak memory is
    one batch of payloads plus one decoded clip, never the corpus.
    """
    if every_n < 1:
        raise ValueError("need every_n >= 1")
    in_cols = [c for c in df.columns if c != payload_col]
    keep_types = {
        f.name: f.dataType.simpleString() for f in df.schema.fields
    }
    out_schema = ", ".join(
        [f"{c} {keep_types[c]}" for c in in_cols]
        + [
            "frame_idx bigint",
            "width int",
            "height int",
            "n_frames bigint",
            "px_sum bigint",
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from garmin_data_pipeline_spark.functions.codecs import decode_video

        for pdf in batches:
            out_rows = []
            for _, row in pdf.iterrows():
                keep = [row[c] for c in in_cols]
                p = row[payload_col]
                try:
                    meta, frames = decode_video(
                        bytes(p) if p is not None else b""
                    )
                except ValueError:
                    out_rows.append(keep + [None, None, None, None, None])
                    continue
                for idx in range(0, meta["n_frames"], every_n):
                    out_rows.append(
                        keep
                        + [
                            idx,
                            meta["width"],
                            meta["height"],
                            meta["n_frames"],
                            int(frames[idx].astype("int64").sum()),
                        ]
                    )
            out = pd.DataFrame(
                out_rows,
                columns=in_cols
                + ["frame_idx", "width", "height", "n_frames", "px_sum"],
            ).astype(
                {
                    "frame_idx": "Int64",
                    "width": "Int32",
                    "height": "Int32",
                    "n_frames": "Int64",
                    "px_sum": "Int64",
                }
            )
            yield out

    return df.mapInPandas(kernel, schema=out_schema)


def decode_image_stats(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """REAL image decode over mapInPandas with exact integer pixel
    statistics: ``width int, height int, format string, px_sum
    bigint`` (sum of all channel values — int64-exact, hash-stable;
    the m5 oracle predicts it analytically from the payload
    construction). Undecodable payloads yield NULL dims/px_sum and
    format ``'unknown'``."""
    in_cols = [c for c in df.columns if c != payload_col]
    keep_types = {
        f.name: f.dataType.simpleString() for f in df.schema.fields
    }
    out_schema = ", ".join(
        [f"{c} {keep_types[c]}" for c in in_cols]
        + ["width int", "height int", "format string", "px_sum bigint"]
    )

    def decode_one(p) -> tuple:
        from garmin_data_pipeline_spark.functions.codecs import decode_image

        try:
            arr, fmt = decode_image(bytes(p) if p is not None else b"")
        except ValueError:
            return None, None, "unknown", None
        h, w = arr.shape[:2]
        return w, h, fmt, int(arr.astype("int64").sum())

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [decode_one(p) for p in pdf[payload_col]]
            stat_df = pd.DataFrame(
                stats,
                columns=["width", "height", "format", "px_sum"],
                index=pdf.index,
            ).astype(
                {"width": "Int32", "height": "Int32", "px_sum": "Int64"}
            )
            yield pd.concat([pdf[in_cols], stat_df], axis=1)

    return df.mapInPandas(kernel, schema=out_schema)


def decode_audio_features(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """REAL WAV decode over mapInPandas: parse the RIFF container and
    PCM samples (``functions/codecs.decode_wav`` — pure stdlib/numpy)
    and emit exact integer amplitude statistics per payload:

    ``sample_rate int, n_channels int, n_frames bigint,
    amp_sum bigint, amp_sq_sum bigint``

    Sums accumulate in int64 (exact for PCM16 up to ~2^33 frames per
    payload), so the output is hash-stable — the m6 oracle predicts
    these values analytically. Undecodable payloads yield NULL meta
    (corrupt files must not fail the job).
    """
    in_cols = [c for c in df.columns if c != payload_col]
    keep_types = {
        f.name: f.dataType.simpleString() for f in df.schema.fields
    }
    out_schema = ", ".join(
        [f"{c} {keep_types[c]}" for c in in_cols]
        + [
            "sample_rate int",
            "n_channels int",
            "n_frames bigint",
            "amp_sum bigint",
            "amp_sq_sum bigint",
        ]
    )

    def decode_one(p) -> tuple:
        from garmin_data_pipeline_spark.functions.codecs import decode_wav

        try:
            meta, samples = decode_wav(bytes(p) if p is not None else b"")
        except ValueError:
            return None, None, None, None, None
        s = samples.astype("int64")
        return (
            meta["sample_rate"],
            meta["n_channels"],
            meta["n_frames"],
            int(s.sum()),
            int((s * s).sum()),
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_one(p) for p in pdf[payload_col]]
            feat_df = pd.DataFrame(
                feats,
                columns=[
                    "sample_rate", "n_channels", "n_frames",
                    "amp_sum", "amp_sq_sum",
                ],
                index=pdf.index,
            ).astype(
                {
                    "sample_rate": "Int32",
                    "n_channels": "Int32",
                    "n_frames": "Int64",
                    "amp_sum": "Int64",
                    "amp_sq_sum": "Int64",
                }
            )
            yield pd.concat([pdf[in_cols], feat_df], axis=1)

    return df.mapInPandas(kernel, schema=out_schema)


def window_audio_frames(
    df: DataFrame,
    window_frames: int,
    hop_frames: int,
    payload_col: str = "payload",
) -> DataFrame:
    """REAL sample-domain audio windowing for PCM WAV payloads with
    the heavy bytes staying JVM-side.

    Two stages: (1) an Arrow kernel parses ONLY the RIFF header per
    payload (``codecs.wav_data_range`` — a few dozen bytes of work,
    the payload itself is returned untouched), yielding
    ``data_offset``/``block_align``/``n_frames`` columns; (2) the same
    exploded-``sequence`` + binary ``substring`` plan as
    :func:`window_audio`, but with offsets measured in FRAMES and
    scaled by ``block_align`` past ``data_offset`` — so each emitted
    ``window`` is the exact PCM bytes of ``window_frames`` samples.
    No payload bytes cross the Python boundary; undecodable payloads
    are dropped (filter ``data_offset IS NULL`` upstream to audit).

    Same no-redundant-tail rule as the byte slicer: window starts are
    emitted while they contribute new frames.
    """
    if hop_frames <= 0 or hop_frames > window_frames:
        raise ValueError("need 0 < hop_frames <= window_frames")
    in_cols = df.columns
    keep_types = {
        f.name: f.dataType.simpleString() for f in df.schema.fields
    }
    hdr_schema = ", ".join(
        [f"{c} {keep_types[c]}" for c in in_cols]
        + ["data_offset bigint", "block_align int", "n_frames bigint"]
    )

    def hdr_kernel(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from garmin_data_pipeline_spark.functions.codecs import (
            wav_data_range,
        )

        def one(p) -> tuple:
            try:
                r = wav_data_range(bytes(p) if p is not None else b"")
                return r["data_offset"], r["block_align"], r["n_frames"]
            except ValueError:
                return None, None, None

        for pdf in batches:
            hdrs = [one(p) for p in pdf[payload_col]]
            hdr_df = pd.DataFrame(
                hdrs,
                columns=["data_offset", "block_align", "n_frames"],
                index=pdf.index,
            ).astype(
                {
                    "data_offset": "Int64",
                    "block_align": "Int32",
                    "n_frames": "Int64",
                }
            )
            yield pd.concat([pdf[in_cols], hdr_df], axis=1)

    hdr = df.mapInPandas(hdr_kernel, schema=hdr_schema)
    overlap = window_frames - hop_frames
    out_cols = [c for c in in_cols if c != payload_col]
    return (
        hdr.filter(F.col("n_frames") > 0)
        .withColumn(
            "window_start",
            F.explode(
                F.sequence(
                    F.lit(0).cast("bigint"),
                    F.greatest(
                        (F.col("n_frames") - overlap - 1).cast("bigint"),
                        F.lit(0).cast("bigint"),
                    ),
                    F.lit(hop_frames).cast("bigint"),
                )
            ),
        )
        .select(
            *out_cols,
            (F.col("window_start") / hop_frames)
            .cast("bigint")
            .alias("window_idx"),
            # the tail window takes ONLY the frames that exist — a
            # fixed window_frames*block_align length would run past
            # the data chunk into trailing RIFF chunks (LIST INFO,
            # fact) and splice metadata bytes onto the PCM
            F.expr(
                f"substring({payload_col}, "
                f"data_offset + window_start * block_align + 1, "
                f"least(CAST({window_frames} AS BIGINT), "
                f"n_frames - window_start) * block_align)"
            ).alias("window"),
            F.least(
                F.lit(window_frames).cast("bigint"),
                F.col("n_frames") - F.col("window_start"),
            ).alias("window_len_frames"),
        )
    )
