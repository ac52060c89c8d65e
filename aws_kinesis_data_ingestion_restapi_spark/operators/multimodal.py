"""Multimodal (image / audio / video) columns as first-class data:
opaque ``binary`` content + typed metadata struct, with decode /
feature-extraction / resize / frame-sampling as Arrow-batched
``mapInPandas`` operators.

The reference repo has no binary surface (SURVEY §2.7); this extends it
for the training-data-pipeline north star. The real-codec path
dispatches to PIL / soundfile / av when those libraries are importable
(``codec_available``), falls back to vendored pure-Python
mini-decoders for the containers they can handle (24bpp BMP via
``decode_bmp_rgb``, PCM WAV via stdlib ``wave`` — so the real branch
is exercised and tested even in this codec-less container), and raises
``NotImplementedError`` only where decoding is genuinely impossible.
The deterministic fake-decode path remains the oracle-checked default. Everything
Spark-side is real and tested either way: the asset schema, the binary
column plumbing, the Arrow batch iteration, the UDF output schemas,
and the partitioning behavior.

Scale design:
- assets are a normal DataFrame with a ``binary`` column — Parquet
  stores it as BYTE_ARRAY, so partition pruning / predicate pushdown on
  the metadata columns work unchanged, and the blobs never pass through
  the driver.
- every Python-side operator is ``mapInPandas`` (Arrow columnar batches,
  zero-copy into numpy) — never a row-at-a-time UDF. Batch size is
  bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so
  executor memory stays flat regardless of corpus size.
- frame sampling fans out 1→N rows inside the iterator (generator
  yields), so no per-task materialization of the full fan-out either.

Cross-engine determinism: the synthetic container payload is the
document text (utf-8); fingerprints are md5 over the UNCHUNKED base64
of the binary (Spark's ``base64`` emits MIME 76-char lines — the
``regexp_replace`` strips them; DuckDB's ``to_base64`` is unchunked),
and frames are CHARACTER blocks so DuckDB ``substring`` / Python str
slicing agree byte-for-byte after utf-8 encoding.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

# ---------------------------------------------------------------------------
# the typed container (deterministic synthetic assets over `documents`)
# ---------------------------------------------------------------------------

KINDS = ("image", "audio", "video")  # doc_id % 3 → kind
MAGIC = {"image": b"IMG0", "audio": b"AUD0", "video": b"VID0"}
FORMATS = {"image": "png", "audio": "wav", "video": "mp4"}
FRAME_CHARS = 256  # one fake video "frame" = 256 chars of payload
FRAME_STRIDE = 2  # sample every 2nd frame
# near-dup fingerprinting keyframes DENSER than the preview sampler:
# at 256-char frames most corpus videos sample a single frame, and a
# one-frame video carries no agreement signal (see video_near_dup)
NEARDUP_FRAME_CHARS = 32

ASSET_META_FIELDS = (
    "format string, width int, height int, channels int, "
    "sample_rate int, duration_ms long, fps int, n_frames int"
)


def synthesize_assets(docs: DataFrame) -> DataFrame:
    """documents → deterministic multimodal assets table:
    (asset_id, kind, content binary, meta struct).

    content = 4-byte magic + utf-8 text payload; kind cycles
    image/audio/video on doc_id; metadata is arithmetic on
    (doc_id, n_chars) so an oracle can re-derive every value. This is
    the fixture generator for the binary pipeline — in production the
    same schema holds real containers (and the decode operators below
    call real codecs instead of the stub).
    """
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    magic = (
        F.when(kind == "image", F.lit(MAGIC["image"]))
        .when(kind == "audio", F.lit(MAGIC["audio"]))
        .otherwise(F.lit(MAGIC["video"]))
    )
    fmt = (
        F.when(kind == "image", F.lit(FORMATS["image"]))
        .when(kind == "audio", F.lit(FORMATS["audio"]))
        .otherwise(F.lit(FORMATS["video"]))
    )
    n_chars = F.length("text")
    n_frames = F.ceil(n_chars / F.lit(float(FRAME_CHARS))).cast("int")
    meta = F.struct(
        fmt.alias("format"),
        F.when(kind == "image", (64 + (F.col("doc_id") % 16) * 32).cast("int")).alias("width"),
        F.when(kind == "image", (64 + (F.col("doc_id") % 9) * 48).cast("int")).alias("height"),
        F.when(kind == "image", F.lit(3)).alias("channels"),
        F.when(kind == "audio", (8000 * (F.col("doc_id") % 5 + 1)).cast("int")).alias(
            "sample_rate"
        ),
        F.when(kind == "audio", (n_chars * 10).cast("long")).alias("duration_ms"),
        F.when(kind == "video", (24 + (F.col("doc_id") % 2) * 6).cast("int")).alias("fps"),
        F.when(kind == "video", n_frames).alias("n_frames"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.concat(magic, F.encode("text", "UTF-8")).alias("content"),
        meta.alias("meta"),
    )


def content_md5(col: Column | str = "content") -> Column:
    """md5 fingerprint of a binary column, engine-portable: hash the
    UNCHUNKED base64 text (Spark base64 is MIME-chunked; strip the line
    breaks to match DuckDB's to_base64 / Python b64encode)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.base64(c), "[\\r\\n]", ""))


# ---------------------------------------------------------------------------
# codec boundary (stubbed — real codecs are not in this container)
# ---------------------------------------------------------------------------


#: codec library per asset kind; resolved lazily so merely importing
#: this module never requires any media dependency.
_CODEC_MODULES = {"image": "PIL", "audio": "soundfile", "video": "av"}


def codec_available(kind: str) -> bool:
    """True if the real codec library for ``kind`` is importable in
    this environment (PIL / soundfile / av). Checked via importlib so
    the decision is configuration, not hardcoding."""
    import importlib.util

    mod = _CODEC_MODULES.get(kind)
    return mod is not None and importlib.util.find_spec(mod) is not None


def decode_bmp_rgb(payload: bytes) -> bytes:
    """Vendored pure-Python BMP decoder (24-bit uncompressed only) —
    the minimal real-codec path exercisable WITHOUT PIL. Returns raw
    RGB bytes, rows top-to-bottom, exactly like
    ``PIL.Image.convert("RGB").tobytes()`` would for the same file.
    Format reference: the public BITMAPFILEHEADER/BITMAPINFOHEADER
    layout (14-byte file header + 40-byte DIB; little-endian fields;
    rows padded to 4 bytes; positive height = bottom-up)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0 or width <= 0:
        raise ValueError("mini decoder handles 24bpp uncompressed BMP only")
    top_down, height = height < 0, abs(height)
    stride = ((width * 3 + 3) // 4) * 4
    # a truncated file would silently yield short/empty row slices and
    # plausible-but-wrong byte stats; PIL raises here too. The bound is
    # the last byte actually read (final row's pixels — its padding may
    # legally be absent).
    needed = data_off + (height - 1) * stride + width * 3 if height > 0 else 0
    if len(payload) < needed:
        raise ValueError(
            f"truncated BMP: pixel data needs {needed} bytes, "
            f"payload has {len(payload)}"
        )
    out = bytearray()
    row_order = range(height) if top_down else range(height - 1, -1, -1)
    for r in row_order:
        line = payload[data_off + r * stride : data_off + r * stride + width * 3]
        for i in range(0, width * 3, 3):
            out += line[i : i + 3][::-1]  # stored BGR → RGB
    return bytes(out)


def decode_wav_pcm(payload: bytes) -> bytes:
    """Vendored WAV decoder via the stdlib ``wave`` module: raw PCM
    sample bytes — byte-identical to ``soundfile.read(dtype='int16')
    .tobytes()`` for PCM16 WAV files."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        return w.readframes(w.getnframes())


def _decode_real(kind: str, payload: bytes) -> dict:
    """Real codec decode: the full library (PIL / soundfile / av) when
    importable, else the vendored mini-decoder when the payload is a
    container it handles (24bpp BMP / PCM WAV), else
    ``NotImplementedError`` — the only genuinely-absent case. Output
    shape matches ``_decode_fake`` (byte statistics of the DECODED
    samples instead of the container payload) so the downstream schema
    is identical on every path.
    """
    if kind == "image":
        if codec_available("image"):  # pragma: no cover - PIL absent here
            import io

            from PIL import Image

            with Image.open(io.BytesIO(payload)) as im:
                raw = im.convert("RGB").tobytes()
            return _byte_stats(raw)
        if payload[:2] == b"BM":
            return _byte_stats(decode_bmp_rgb(payload))
    elif kind == "audio":
        if codec_available("audio"):  # pragma: no cover - soundfile absent
            import io

            import soundfile as sf

            data, _rate = sf.read(io.BytesIO(payload), dtype="int16")
            return _byte_stats(data.tobytes())
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return _byte_stats(decode_wav_pcm(payload))
    elif kind == "video" and codec_available("video"):
        # pragma: no cover - av absent here. The kind check matters: a
        # bare codec_available branch routed ANY unknown kind into
        # av.open on an arbitrary payload (InvalidDataError) instead
        # of the documented NotImplementedError below.
        import io

        import av

        with av.open(io.BytesIO(payload)) as container:
            frame = next(container.decode(video=0))
            raw = bytes(frame.planes[0])
        return _byte_stats(raw)
    raise NotImplementedError(
        f"no {_CODEC_MODULES.get(kind, '?')} in this environment and the "
        f"payload is not a vendored-decodable container for kind={kind!r}; "
        "use fake_decode=True (deterministic byte-stats decode) or install "
        "PIL/soundfile/av"
    )


def _byte_stats(payload: bytes) -> dict:
    """The shared feature shape of both decode paths.

    numpy path is BIT-EXACT vs the plain-int fallback: uint8 sums in
    int64 are exact integers (< 2^53 for any real payload), min/max are
    exact, and the one final division is the same IEEE double op — so
    the oracle hash is unchanged while the per-asset Python loop cost
    drops ~10× (measured on mm_extract_features at sf0.1)."""
    n = len(payload)
    if n == 0:
        return {"n_bytes": 0, "byte_mean": 0.0, "byte_min": 0, "byte_max": 0}
    try:
        import numpy as np

        arr = np.frombuffer(payload, dtype=np.uint8)
        return {
            "n_bytes": n,
            "byte_mean": int(arr.sum(dtype=np.int64)) / n,
            "byte_min": int(arr.min()),
            "byte_max": int(arr.max()),
        }
    except ImportError:  # pragma: no cover - numpy is baked into this env
        return {
            "n_bytes": n,
            "byte_mean": sum(payload) / n,
            "byte_min": min(payload),
            "byte_max": max(payload),
        }


def _decode_fake(kind: str, payload: bytes) -> dict:
    """Deterministic stand-in decode: byte statistics of the raw
    payload. Same shape as a real decode result (a per-asset feature
    dict)."""
    return _byte_stats(payload)


# ---------------------------------------------------------------------------
# mapInPandas operators (the Python-side batch plumbing)
# ---------------------------------------------------------------------------

FEATURES_SCHEMA = (
    "asset_id long, kind string, n_bytes long, byte_mean double, "
    "byte_min int, byte_max int, payload_md5 string"
)


def extract_features(assets: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Decode + feature-extract each asset via Arrow-batched
    ``mapInPandas``: binary content → per-asset feature row. With
    ``fake_decode`` (default — no codecs in this image) features are
    deterministic byte statistics; the real-codec path raises
    ``NotImplementedError`` at the clearly-marked stub."""
    decode = _decode_fake if fake_decode else _decode_real

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for asset_id, kind, content in zip(
                pdf["asset_id"], pdf["kind"], pdf["content"]
            ):
                payload = bytes(content)[4:]  # strip container magic
                feats = decode(kind, payload)
                rows.append(
                    {
                        "asset_id": asset_id,
                        "kind": kind,
                        **feats,
                        "payload_md5": hashlib.md5(payload).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "asset_id", "kind", "n_bytes", "byte_mean",
                "byte_min", "byte_max", "payload_md5",
            ])

    return assets.select("asset_id", "kind", "content").mapInPandas(
        batches, schema=FEATURES_SCHEMA
    )


FRAMES_SCHEMA = "asset_id long, frame_idx int, frame_chars long, frame_md5 string"


def sample_frames(
    assets: DataFrame,
    frame_chars: int = FRAME_CHARS,
    stride: int = FRAME_STRIDE,
) -> DataFrame:
    """Frame-sample the video assets: 1 asset → ⌈n/frame_chars⌉ frames,
    keep every ``stride``-th. Frames are CHARACTER blocks of the utf-8
    payload (a real implementation would pull codec keyframes here —
    the fan-out/batching shape is identical), emitted lazily from the
    Arrow batch iterator so the 1→N inflation never materializes
    per-task."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                text = bytes(content)[4:].decode("utf-8")
                n_frames = math.ceil(len(text) / frame_chars) if text else 0
                for i in range(0, n_frames, stride):
                    frame = text[i * frame_chars : (i + 1) * frame_chars]
                    rows.append(
                        {
                            "asset_id": asset_id,
                            "frame_idx": i,
                            "frame_chars": len(frame),
                            "frame_md5": hashlib.md5(frame.encode("utf-8")).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "frame_chars", "frame_md5"]
            )

    return (
        assets.filter(F.col("kind") == "video")
        .select("asset_id", "content")
        .mapInPandas(batches, schema=FRAMES_SCHEMA)
    )


RESIZED_SCHEMA = (
    "asset_id long, content binary, format string, width int, height int"
)


def resize_images(assets: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize the image assets to (width, height) via ``mapInPandas``.
    The pixel resample is the stubbed codec step — the fake keeps a
    deterministic byte stride of the payload sized w·h·3 (so output
    size scales like a real resize) and rewrites the metadata; the
    batch/schema/binary-output plumbing is the real thing."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        target = width * height * 3
        for pdf in it:
            rows = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                payload = bytes(content)[4:]
                if payload:
                    step = max(1, len(payload) // target)
                    resized = payload[::step][:target]
                else:
                    resized = b""
                rows.append(
                    {
                        "asset_id": asset_id,
                        "content": MAGIC["image"] + resized,
                        "format": FORMATS["image"],
                        "width": width,
                        "height": height,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "content", "format", "width", "height"]
            )

    return (
        assets.filter(F.col("kind") == "image")
        .select("asset_id", "content")
        .mapInPandas(batches, schema=RESIZED_SCHEMA)
    )


# ---------------------------------------------------------------------------
# perceptual-hash near-duplicates (bridges multimodal -> dedup family)
# ---------------------------------------------------------------------------

PHASH_GRID_ROWS = 8  # dHash grid: 8 rows x 9 cols -> 8x8 gradient bits
PHASH_GRID_COLS = 9
PHASH_BANDS = 4  # 64 bits packed as 4 x 16-bit bands
PHASH_D_MAX = 3  # <= BANDS-1: banding is EXHAUSTIVE (pigeonhole)

PHASH_SCHEMA = "asset_id long, band int, band_val long"


def phash_bands(assets: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Per-image dHash (difference hash — the standard perceptual
    image fingerprint: downsample to a (rows × cols) brightness grid,
    emit bit r,c = 1 iff grid[r][c] < grid[r][c+1]) computed inside
    the SAME Arrow-batched ``mapInPandas`` decode path the other
    multimodal operators use, emitted directly in LONG form — one row
    per 16-bit band, ``(asset_id, band, band_val)`` — which is both
    the registry no-array contract and exactly the key the hamming
    band join needs.

    Deterministic fake-decode contract (no codecs in this container):
    the "brightness grid" is an integer downsample of the payload's
    CHARACTER CODES — grid[r][c] = ord(payload[((r·9+c)·n) // 72]) —
    so a DuckDB oracle replays the identical hash with
    unicode(substr(...)) arithmetic on the same binary fixtures. With
    real codecs the grid would be decoded luminance (PIL
    ``convert("L").resize((9, 8))``); everything downstream — band
    packing, pigeonhole join, popcount verify — is unchanged, which
    is the point of hashing at the decode boundary."""
    if not fake_decode:  # pragma: no cover - no codecs in this env
        raise NotImplementedError(
            "real-codec pHash needs PIL; the deterministic fake decode "
            "is the oracle-checked path in this environment"
        )
    rows_n, cols_n = PHASH_GRID_ROWS, PHASH_GRID_COLS
    cells = rows_n * cols_n

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                s = bytes(content)[4:].decode("utf-8")
                n = len(s)
                if n == 0:
                    continue
                grid = [
                    [
                        ord(s[((r * cols_n + c) * n) // cells])
                        for c in range(cols_n)
                    ]
                    for r in range(rows_n)
                ]
                for band in range(PHASH_BANDS):
                    val = 0
                    for rr in range(2):  # 2 grid rows per 16-bit band
                        r = band * 2 + rr
                        for c in range(cols_n - 1):
                            if grid[r][c] < grid[r][c + 1]:
                                val |= 1 << (rr * 8 + c)
                    out.append(
                        {"asset_id": asset_id, "band": band, "band_val": val}
                    )
            yield pd.DataFrame(out, columns=["asset_id", "band", "band_val"])

    return (
        assets.filter(F.col("kind") == "image")
        .select("asset_id", "content")
        .mapInPandas(batches, schema=PHASH_SCHEMA)
    )


def phash_near_dup(assets: DataFrame, d_max: int = PHASH_D_MAX) -> DataFrame:
    """Image near-duplicate pairs by perceptual hash — the bridge
    between the multimodal decode family and the X4 hamming-band
    dedup machinery (the VERDICT r7 'honorable mention': images were
    decoded, featurized, resized, but never deduplicated).

    Same contract as simhash_near_pairs: candidates come from an
    equi-join on (band, band_val) — 4 bands × 16 bits, so any pair
    within hamming distance ≤ 3 shares at least one exact band
    (pigeonhole: 4 bands can absorb at most 3 differing bits without
    one staying intact) and banding is EXHAUSTIVE for the default
    threshold, never all-pairs — then the exact popcount verify
    (Σ bit_count(xor) over the 4 bands) prunes false candidates.

    Scale shape: the band join carries (id, band, int16-in-int64)
    rows only; Σ|bucket|² candidate pairs, deduped on the pair key;
    the verify joins band vectors back by id — at corpus scale each
    step is an equi-join shuffle on short keys, the simhash argument
    verbatim (dedup.py simhash_near_pairs)."""
    return _band_near_dup(phash_bands(assets), d_max)


def band_candidate_distances(bands: DataFrame) -> DataFrame:
    """UNFILTERED hamming distances of every band-colliding candidate
    pair — the threshold-setting instrument for the pigeonhole
    near-dup family (X204): the same candidate join and exact
    popcount verify as :func:`_band_near_dup`, minus the d_max cut,
    so the distance HISTOGRAM shows where the true-duplicate mode
    ends and the collision noise begins (set d_max in the gap).
    Returns (asset_a, asset_b, hamming) for every candidate."""
    return _band_near_dup(bands, d_max=None)


def _band_near_dup(bands: DataFrame, d_max: int | None) -> DataFrame:
    """Pigeonhole band join + exact popcount verify over any
    (asset_id, band, band_val) fingerprint frame — shared by the
    image dHash (:func:`phash_near_dup`) and the audio energy hash
    (:func:`afp_near_dup`): the banding/verify machinery is
    fingerprint-agnostic, which is the point of hashing at the
    decode boundary."""
    a = bands.select(
        F.col("asset_id").alias("asset_a"), "band", "band_val"
    )
    b = bands.select(
        F.col("asset_id").alias("asset_b"), "band", "band_val"
    )
    cand = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("asset_a") < F.col("asset_b"))
        .select("asset_a", "asset_b")
        .dropDuplicates(["asset_a", "asset_b"])
    )
    xa = bands.select(
        F.col("asset_id").alias("asset_a"), "band", F.col("band_val").alias("va")
    )
    xb = bands.select(
        F.col("asset_id").alias("asset_b"), "band", F.col("band_val").alias("vb")
    )
    return (
        cand.join(xa, "asset_a")
        .join(xb, ["asset_b", "band"])
        .groupBy("asset_a", "asset_b")
        .agg(
            F.sum(F.bit_count(F.col("va").bitwiseXOR(F.col("vb"))))
            .cast("int")
            .alias("hamming")
        )
        .filter(
            F.lit(True) if d_max is None else (F.col("hamming") <= d_max)
        )
        .select("asset_a", "asset_b", "hamming")
    )


def rerendered_assets(docs: DataFrame) -> DataFrame:
    """Assets plus deterministic RE-RENDERS — the fixture geometry the
    pHash near-dup needs (same precedent as similarity.
    clustered_embeddings): the synthetic corpus has essentially no
    duplicate image payloads, so the operator's gate row would be an
    always-empty result. Every 30th document (i.e. every 10th image
    asset) is re-rendered as asset_id + 30_000_000 (a multiple of 3, so the re-render
    keeps kind='image' under the doc_id % 3 cycle) with ONE character
    replaced at the text midpoint — the byte content changes (md5
    differs, exact dedup misses it) while at most one dHash grid cell
    is resampled, flipping ≤ 2 gradient bits, so the pair sits within
    the d ≤ 3 emission threshold BY CONSTRUCTION — *for texts of ≥ 72
    chars*, where the 72-cell grid samples each character at most
    once. A shorter text's midpoint char can back several cells and
    push hamming past d_max, silently dropping the engineered pair
    (r8 ADVICE), so re-render candidates are length-guarded: the
    selection keeps only docs the guarantee actually holds for (at
    sf0.1 this excludes 3 of 167 candidates). Pure column arithmetic;
    the DuckDB oracle re-derives the identical guarded re-render."""
    rr = docs.filter(
        (F.col("doc_id") % 30 == 0) & (F.length("text") >= 72)
    ).select(
        (F.col("doc_id") + 30_000_000).alias("doc_id"),
        F.expr(
            "substring(text, 1, length(text) DIV 2) || 'z' || "
            "substring(text, length(text) DIV 2 + 2)"
        ).alias("text"),
    )
    base = docs.select("doc_id", "text")
    return synthesize_assets(base.unionByName(rr))


def _pack_grid_bands(asset_id, energy: list) -> list:
    """Pack a 72-value grid (8 rows × 9 cols) into 4 × 16-bit
    sign-of-delta band rows — the gradient-bit packing shared by the
    audio energy fingerprint (:func:`afp_bands`) and the video
    frame-hash fingerprint (:func:`vhash_bands`); the image dHash
    packs the same geometry inside its own decode loop."""
    rows_n, cols_n = PHASH_GRID_ROWS, PHASH_GRID_COLS
    grid = [energy[r * cols_n:(r + 1) * cols_n] for r in range(rows_n)]
    out = []
    for band in range(PHASH_BANDS):
        val = 0
        for rr in range(2):
            r = band * 2 + rr
            for c in range(cols_n - 1):
                if grid[r][c] < grid[r][c + 1]:
                    val |= 1 << (rr * 8 + c)
        out.append({"asset_id": asset_id, "band": band, "band_val": val})
    return out


def afp_bands(assets: DataFrame, fake_decode: bool = True) -> DataFrame:
    """X142: per-AUDIO-asset energy fingerprint, the acoustic sibling
    of :func:`phash_bands` (the standard audio-fingerprint shape —
    Chromaprint/Shazam-family hashes are sign-of-delta bits over a
    time-frequency energy grid; this build uses sign-of-delta bits
    over a 72-WINDOW time-energy profile, packed into the same
    4 × 16-bit bands so the pigeonhole banding machinery is shared
    verbatim).

    Deterministic fake-decode contract (no audio codecs in this
    container): window energy = Σ character codes over the payload's
    w-th contiguous 72-way slice — windows PARTITION the payload, so
    a one-character re-render perturbs exactly one window and flips
    at most the 2 adjacent gradient bits, UNCONDITIONALLY (no length
    guard needed, unlike the image grid's point samples — this is
    why the fixture has no ≥72-char filter). With a real codec the
    windows would be per-frame PCM energy from decode_wav_pcm;
    everything downstream is unchanged."""
    if not fake_decode:  # pragma: no cover - no codecs in this env
        raise NotImplementedError(
            "real-codec audio fingerprints need soundfile; the "
            "deterministic fake decode is the oracle-checked path"
        )
    rows_n, cols_n = PHASH_GRID_ROWS, PHASH_GRID_COLS
    cells = rows_n * cols_n

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                s = bytes(content)[4:].decode("utf-8")
                n = len(s)
                if n == 0:
                    continue
                energy = [
                    sum(
                        ord(ch)
                        for ch in s[(w * n) // cells:((w + 1) * n) // cells]
                    )
                    for w in range(cells)
                ]
                out.extend(_pack_grid_bands(asset_id, energy))
            yield pd.DataFrame(out, columns=["asset_id", "band", "band_val"])

    return (
        assets.filter(F.col("kind") == "audio")
        .select("asset_id", "content")
        .mapInPandas(batches, schema=PHASH_SCHEMA)
    )


def afp_near_dup(assets: DataFrame, d_max: int = PHASH_D_MAX) -> DataFrame:
    """Audio near-duplicate pairs by energy fingerprint — the same
    pigeonhole band join + exact popcount verify the image pHash
    rides (:func:`_band_near_dup`); only the fingerprint extractor
    differs. Output (asset_a, asset_b, hamming)."""
    return _band_near_dup(afp_bands(assets), d_max)


def rerendered_audio_assets(docs: DataFrame) -> DataFrame:
    """Assets plus deterministic audio RE-RENDERS (the fixture
    geometry afp_near_dup needs — same precedent as
    :func:`rerendered_assets`): every 30th AUDIO document
    (doc_id ≡ 1 mod 30 → kind='audio' under the doc_id % 3 cycle) is
    re-encoded as asset_id + 30_000_000 (≡ 0 mod 3, kind preserved)
    with one character replaced at the text midpoint. Unlike the
    image grid's point samples, the energy windows PARTITION the
    payload, so the ≤2-bit guarantee holds for every length — no
    ≥72-char guard."""
    rr = docs.filter(
        (F.col("doc_id") % 30 == 1) & (F.length("text") > 0)
    ).select(
        (F.col("doc_id") + 30_000_000).alias("doc_id"),
        F.expr(
            "substring(text, 1, length(text) DIV 2) || 'z' || "
            "substring(text, length(text) DIV 2 + 2)"
        ).alias("text"),
    )
    base = docs.select("doc_id", "text")
    return synthesize_assets(base.unionByName(rr))


# ---------------------------------------------------------------------------
# X159: video near-dup over ordered frame-hash sequences
# ---------------------------------------------------------------------------


def frame_hash_sequences(
    assets: DataFrame,
    frame_chars: int = FRAME_CHARS,
    stride: int = FRAME_STRIDE,
) -> DataFrame:
    """Per-video ORDERED frame-hash sequence — :func:`sample_frames`'
    extractor (identical frame blocks and stride), reduced to one
    (asset_id, seq array<string>) row; order restored from frame_idx
    before collect_list's nondeterministic arrival order can leak."""
    frames = sample_frames(assets, frame_chars, stride)
    return frames.groupBy("asset_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("frame_idx", "frame_md5"))),
            lambda s: s["frame_md5"],
        ).alias("seq")
    )


def video_near_dup(
    assets: DataFrame,
    frame_chars: int = NEARDUP_FRAME_CHARS,
    stride: int = FRAME_STRIDE,
    max_mismatch: int = 1,
) -> DataFrame:
    """X159: VIDEO near-duplicate pairs — the third modality of the
    multimodal dedup family (image X104, audio X142): two videos are
    near-dups when their ordered frame-hash sequences have EQUAL
    length, differ in at most ``max_mismatch`` positions, AND agree
    on at least one frame (the single-frame-corruption class: a
    re-encode glitch, a stamped keyframe, an overlay on one frame).
    The agreement floor keeps the relation meaningful at the short
    end — without it every pair of 1-frame videos is vacuously
    "within one edit" (measured: 14,181 such false pairs at sf0.001);
    with it a 1-frame video matches only its exact dups. Fingerprint
    frames default DENSER (32 chars) than the 256-char preview
    sampler for the same reason: most corpus videos sample a single
    256-char frame, and one frame carries no agreement signal.

    Design note — why NOT the X104/X142 banded grid signature: pooled
    sign-of-delta grids DEGENERATE on short frame sequences (a
    1-sampled-frame video fills one grid cell; every such video
    shares one near-constant signature — measured 16,653 hamming-0
    FALSE pairs at sf0.001, where most corpus videos sample 1-4
    frames). Sequences need sequence blocking: this is the X39
    deletion-neighborhood guarantee LIFTED FROM CHARACTERS TO FRAME
    TOKENS — two equal-length sequences with ≤ 1 mismatching token
    necessarily share a one-token-deletion variant (delete the
    mismatch position), so candidates come from an equi-join on
    md5-hashed deletion variants (|seq|+1 variants per video, LINEAR
    blowup, never all-pairs; the identity variant catches exact
    sequence dups) and one exact positional comparison per candidate
    verifies. Zero false negatives at ``max_mismatch`` = 1 by the
    FastSS pigeonhole; tokens are fixed-width hex so the '|'-joined
    variant string is unambiguous.

    Scale shape: one shuffle on short variant hashes, Σ|bucket|²
    candidates (engineered re-renders + true dups only), verify =
    zip_with over two already-joined arrays. Output
    (asset_a, asset_b, n_frames, n_diff)."""
    if max_mismatch != 1:
        raise ValueError("deletion-variant blocking is exhaustive for k=1")
    seqs = frame_hash_sequences(assets, frame_chars, stride)
    n = F.size("seq")
    joined = F.md5(F.concat_ws("|", F.col("seq")))
    # deletion variants only exist for n >= 2: a 1-frame video can
    # only EXACT-match (agreement floor), and its empty-sequence
    # variant would otherwise bucket every 1-frame video together —
    # the quadratic blowup the blocking exists to avoid
    dels = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.md5(
                F.concat_ws(
                    "|",
                    F.concat(
                        F.slice("seq", F.lit(1), i - F.lit(1)),
                        F.slice("seq", i + F.lit(1), F.size("seq") - i),
                    ),
                )
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    variants = F.array_union(F.array(joined), dels)
    var = seqs.select("asset_id", F.explode(variants).alias("_v"))
    a = var.select(F.col("asset_id").alias("asset_a"), "_v")
    b = var.select(F.col("asset_id").alias("asset_b"), "_v")
    cand = (
        a.join(b, "_v")
        .filter(F.col("asset_a") < F.col("asset_b"))
        .select("asset_a", "asset_b")
        .dropDuplicates(["asset_a", "asset_b"])
    )
    sa = seqs.select(F.col("asset_id").alias("asset_a"), F.col("seq").alias("seq_a"))
    sb = seqs.select(F.col("asset_id").alias("asset_b"), F.col("seq").alias("seq_b"))
    n_diff = F.size(
        F.filter(
            F.zip_with("seq_a", "seq_b", lambda x, y: x != y),
            lambda z: z,
        )
    )
    return (
        cand.join(sa, "asset_a")
        .join(sb, "asset_b")
        .filter(F.size("seq_a") == F.size("seq_b"))
        .select(
            "asset_a",
            "asset_b",
            F.size("seq_a").cast("long").alias("n_frames"),
            n_diff.cast("long").alias("n_diff"),
        )
        .filter(
            (F.col("n_diff") <= max_mismatch)
            & (F.col("n_frames") - F.col("n_diff") >= 1)
        )
    )


def rerendered_video_assets(docs: DataFrame) -> DataFrame:
    """Assets plus deterministic VIDEO re-renders (the fixture
    geometry video_near_dup needs — the X104/X142 precedent): every
    30th VIDEO document (doc_id ≡ 2 mod 30 → kind='video' under the
    doc_id % 3 cycle) is re-encoded as asset_id + 30_000_000 (≡ 0
    mod 3 offset, kind preserved) with one character replaced at the
    text midpoint. The edit lands inside exactly one 32-char
    fingerprint frame, so the re-rendered sequence has EQUAL length
    and at most one mismatching frame hash (zero when the edited
    frame is unsampled or the replaced char was already 'z'). The
    ≥96-char guard (the X104 length-guard precedent) ensures ≥ 3
    total → ≥ 2 SAMPLED fingerprint frames, so the agreement floor
    is satisfiable even when the edit hits a sampled frame."""
    rr = docs.filter(
        (F.col("doc_id") % 30 == 2) & (F.length("text") >= 96)
    ).select(
        (F.col("doc_id") + 30_000_000).alias("doc_id"),
        F.expr(
            "substring(text, 1, length(text) DIV 2) || 'z' || "
            "substring(text, length(text) DIV 2 + 2)"
        ).alias("text"),
    )
    base = docs.select("doc_id", "text")
    return synthesize_assets(base.unionByName(rr))
