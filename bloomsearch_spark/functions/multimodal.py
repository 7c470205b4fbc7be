"""Multimodal (image/audio/video) column operators for training pipelines.

Media travel as opaque ``binary`` columns with typed metadata, exactly as a
100 TB multimodal corpus would store them next to text.  The Spark-side
plumbing — schemas, Arrow batch shapes, mapInPandas signatures, explode
semantics — is real and tested; the *codec* layer is pluggable:

- real decoders (PIL / soundfile / av) are used when importable — this
  container has none, so they are gated behind import-try;
- a deterministic **FAKE1 codec** (16-byte header ``b"FAKE1IMG"`` +
  width/height/seed, pixels = splitmix of (seed, i)) ships in-tree so every
  stage is testable end-to-end with row-exact oracles;
- any other format raises ``NotImplementedError`` naming the missing
  library (the clearly-marked stub the build brief asks for).

All functions are Arrow-batched (pandas UDF / mapInPandas) — bytes are
sliced with numpy ``frombuffer``, never per-row Python loops over pixels.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

try:  # real image codec, absent in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

_FAKE_MAGIC = b"FAKE1IMG"

# magic-number -> format, detectable JVM-side from the first bytes
_MAGIC_HEX = {
    "89504E47": "png",
    "FFD8FF": "jpeg",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi container
    "664C6143": "flac",
    "46414B45": "fake1",  # b"FAKE" prefix of FAKE1IMG
}


# ---------------------------------------------------------------------------
# FAKE1 codec (deterministic; the test/oracle path)
# ---------------------------------------------------------------------------


def fake_image_bytes(width: int, height: int, seed: int) -> bytes:
    """16-byte header + no payload (pixels are derived, not stored):
    ``FAKE1IMG | u16 width | u16 height | u32 seed``."""
    return _FAKE_MAGIC + struct.pack("<HHI", width, height, seed)


def _splitmix(seed: np.ndarray) -> np.ndarray:
    z = (seed.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def fake_mean_luma(seed: int | np.ndarray) -> np.ndarray:
    """Deterministic 'mean pixel' of a FAKE1 image.  Deliberately
    SQL-expressible — ``(seed*31 + 7) % 256`` — so decode results have
    row-exact DuckDB oracles."""
    s = np.asarray(seed, dtype=np.int64)
    return (s * 31 + 7) % 256


# ---------------------------------------------------------------------------
# Metadata (pure Catalyst — no Python)
# ---------------------------------------------------------------------------


def with_media_metadata(df: DataFrame, binary_col: str, prefix: str = "media") -> DataFrame:
    """Attach (format, size_bytes) typed metadata from magic numbers —
    whole-stage-codegen expressions only, no UDF."""
    head = F.upper(F.hex(F.substring(F.col(binary_col), 1, 4)))
    fmt = F.lit("unknown")
    for magic, name in _MAGIC_HEX.items():
        fmt = F.when(head.startswith(magic), F.lit(name)).otherwise(fmt)
    return df.withColumn(f"{prefix}_format", fmt).withColumn(
        f"{prefix}_size_bytes", F.length(F.col(binary_col))
    )


# ---------------------------------------------------------------------------
# Decode / feature extraction (Arrow-batched; codec-pluggable)
# ---------------------------------------------------------------------------

DECODE_SCHEMA = "width int, height int, channels int, mean_luma double"


def _decode_one(raw: bytes) -> tuple[int, int, int, float]:
    if raw is None or len(raw) < 8:
        return (0, 0, 0, float("nan"))
    if raw[:8] == _FAKE_MAGIC:
        if len(raw) < 16:  # magic matched but the 16-byte header is cut
            raise ValueError(
                f"truncated FAKE1IMG blob: {len(raw)} bytes < 16-byte header"
            )
        w, h, seed = struct.unpack("<HHI", raw[8:16])
        return (w, h, 1, float(fake_mean_luma(seed)))
    if _HAVE_PIL:
        import io

        with Image.open(io.BytesIO(raw)) as im:
            arr = np.asarray(im.convert("L"), dtype=np.float64)
            return (im.width, im.height, len(im.getbands()), float(arr.mean()))
    raise NotImplementedError(
        "real image decode requires Pillow, which is not installed in this "
        "environment; only the deterministic FAKE1 codec is available"
    )


def decode_images(df: DataFrame, binary_col: str, keep: list[str]) -> DataFrame:
    """Decode image binaries into typed feature columns.

    ``keep``: passthrough columns.  One mapInPandas pass; output schema is
    fixed so downstream plans are stable whatever the codec."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keep).schema.fields
    )
    schema = f"{out_schema}, {DECODE_SCHEMA}"

    def fn(batches):
        for pdf in batches:
            decoded = pdf[binary_col].map(_decode_one)
            out = pdf[keep].copy()
            out["width"] = [d[0] for d in decoded]
            out["height"] = [d[1] for d in decoded]
            out["channels"] = [d[2] for d in decoded]
            out["mean_luma"] = [d[3] for d in decoded]
            yield out

    return df.select(*keep, binary_col).mapInPandas(fn, schema)


def resize_images(
    df: DataFrame, binary_col: str, keep: list[str], width: int, height: int
) -> DataFrame:
    """Resize plumbing: same batch shape as decode_images, emits resized
    binaries.  FAKE1 images 'resize' by header rewrite (payload is derived);
    real formats require Pillow."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keep).schema.fields
    )
    schema = f"{out_schema}, resized binary"

    def one(raw: bytes) -> bytes:
        if raw is None:  # null blob -> null resized (decode_images parity)
            return None
        if raw[:8] == _FAKE_MAGIC:
            if len(raw) < 16:
                raise ValueError(
                    f"truncated FAKE1IMG blob: {len(raw)} bytes < 16-byte header"
                )
            _, _, seed = struct.unpack("<HHI", raw[8:16])
            return fake_image_bytes(width, height, seed)
        if _HAVE_PIL:
            import io

            with Image.open(io.BytesIO(raw)) as im:
                buf = io.BytesIO()
                im.resize((width, height)).save(buf, format=im.format or "PNG")
                return buf.getvalue()
        raise NotImplementedError(
            "real image resize requires Pillow (not installed); "
            "only the FAKE1 codec is available"
        )

    def fn(batches):
        for pdf in batches:
            out = pdf[keep].copy()
            out["resized"] = pdf[binary_col].map(one)
            yield out

    return df.select(*keep, binary_col).mapInPandas(fn, schema)


# ---------------------------------------------------------------------------
# Video frame sampling (1 row in -> N rows out)
# ---------------------------------------------------------------------------

_FAKE_VIDEO_MAGIC = b"FAKE1VID"


def fake_video_bytes(n_frames: int, width: int, height: int, seed: int) -> bytes:
    """Header + one FAKE1 image blob per frame (frame seed = seed + idx)."""
    out = _FAKE_VIDEO_MAGIC + struct.pack("<I", n_frames)
    for i in range(n_frames):
        out += fake_image_bytes(width, height, seed + i)
    return out


def sample_frames(
    df: DataFrame, binary_col: str, keep: list[str], every_n: int = 1
) -> DataFrame:
    """Explode videos into sampled frame rows (frame_idx, frame binary) —
    the 1->N mapInPandas shape used for real frame extraction (pyav).
    FAKE1VID decodes in-tree; other containers raise NotImplementedError."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keep).schema.fields
    )
    schema = f"{out_schema}, frame_idx int, frame binary"

    def fn(batches):
        # Vectorized 1->N explode: FAKE1VID frames are fixed-width 16-byte
        # slices, so the whole batch demuxes as numpy offset arithmetic
        # over ONE concatenated buffer — the per-batch template the real
        # pyav path would follow (decode a batch, gather frames by offset),
        # with zero per-row Python (CLAUDE.md hot-path rule).
        empty = pd.DataFrame(columns=[*keep, "frame_idx", "frame"])
        for pdf in batches:
            pdf = pdf[pdf[binary_col].notna()].reset_index(drop=True)
            if not len(pdf):
                yield empty
                continue
            raws = pdf[binary_col].to_numpy(dtype=object)
            if any(r[:8] != _FAKE_VIDEO_MAGIC for r in raws):
                raise NotImplementedError(
                    "real video demux requires PyAV (not installed); "
                    "only the FAKE1VID container is available"
                )
            buf = np.frombuffer(b"".join(raws), dtype=np.uint8)
            blob_lens = np.fromiter((len(r) for r in raws), dtype=np.int64, count=len(raws))
            blob_starts = np.zeros(len(raws), dtype=np.int64)
            np.cumsum(blob_lens[:-1], out=blob_starts[1:])
            # frame counts from each 4-byte LE header at offset 8
            n_frames = (
                buf[blob_starts[:, None] + (8 + np.arange(4))[None, :]]
                .astype(np.int64)
                @ (1 << (8 * np.arange(4, dtype=np.int64)))
            )
            # the header frame count is untrusted input: a truncated blob
            # would otherwise make the offset gather silently read bytes
            # from the NEXT row's blob (or IndexError at the buffer end)
            need = 12 + n_frames * 16
            bad = np.flatnonzero(blob_lens < need)
            if len(bad):
                i = int(bad[0])
                raise ValueError(
                    f"truncated FAKE1VID blob: header declares "
                    f"{int(n_frames[i])} frames ({int(need[i])} bytes) but "
                    f"blob is {int(blob_lens[i])} bytes"
                )
            counts = (n_frames + every_n - 1) // every_n  # sampled per row
            total = int(counts.sum())
            if total == 0:
                yield empty
                continue
            row_of = np.repeat(np.arange(len(raws)), counts)
            cum = np.zeros(len(raws), dtype=np.int64)
            np.cumsum(counts[:-1], out=cum[1:])
            frame_idx = (np.arange(total) - cum[row_of]) * every_n
            starts = blob_starts[row_of] + 12 + frame_idx * 16
            gathered = buf[starts[:, None] + np.arange(16)[None, :]]  # (total, 16)
            out = pdf[keep].iloc[row_of].reset_index(drop=True)
            out["frame_idx"] = frame_idx.astype(np.int32)
            out["frame"] = [g.tobytes() for g in gathered]
            yield out

    return df.select(*keep, binary_col).mapInPandas(fn, schema)


# ---------------------------------------------------------------------------
# Media embedding (deterministic fake -> feeds the similarity operators)
# ---------------------------------------------------------------------------


def embed_media(df: DataFrame, binary_col: str, keep: list[str], dim: int = 16) -> DataFrame:
    """Deterministic pseudo-embedding of a media blob (splitmix of
    (content-hash, i), scaled to [-1,1]).  Stands in for a real encoder;
    the schema/partitioning/batching is what a GPU encoder stage would use."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keep).schema.fields
    )
    schema = f"{out_schema}, embedding array<float>"

    def fn(batches):
        for pdf in batches:
            seeds = pdf[binary_col].map(
                lambda b: np.uint64(0) if b is None
                else np.frombuffer(b[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
            ).to_numpy(dtype=np.uint64)
            idx = np.arange(dim, dtype=np.uint64)
            z = _splitmix(seeds[:, None] * np.uint64(1099511628211) + idx[None, :])
            emb = (z % np.uint64(2001)).astype(np.float32) / 1000.0 - 1.0
            out = pdf[keep].copy()
            out["embedding"] = list(emb)
            yield out

    return df.select(*keep, binary_col).mapInPandas(fn, schema)
