"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The Spark-side pattern is real and scale-correct — binary column, Arrow
batches through ``mapInPandas``, per-batch vectorized work, no
``collect()``.

The decode itself is tiered:

1. **Real header decode** (always available, pure stdlib): PNG / GIF /
   JPEG payloads get their TRUE width/height parsed from the container
   header (IHDR chunk, logical-screen descriptor, SOF marker) — no
   imaging library needed for metadata extraction.
2. **PIL fallback** (import-gated; absent in this container): full decode
   for any other format Pillow recognizes.
3. **Deterministic pseudo-decode** for payloads no decoder recognizes
   (e.g. the utf-8 text stand-ins the oracle-graded fixture queries use) —
   pseudo-dims from the payload length so the DuckDB oracle can reproduce
   them. Pixel-level ops (resize kernels, CNN features) remain stubbed;
   the schema, partitioning, UDF signature, and batch shape are the same
   ones a Pillow/torchaudio kernel would use.

At 100 TB: payloads live in parquet binary columns (or object-store URIs
resolved inside the batch fn); ``mapInPandas`` streams Arrow batches so
executor memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id long, byte_len int, width int, height int, n_frames int"
)

_HAVE_PIL = False
try:  # full-decode fallback gated behind an import-try; absent here
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    pass

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG start-of-frame markers carrying dimensions (C4=DHT, C8=JPG ext,
# CC=DAC are NOT SOF)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_image_dims(b: bytes) -> tuple[int, int] | None:
    """REAL metadata decode: (width, height) from a PNG / GIF / JPEG
    payload's own header, pure stdlib. Returns ``None`` for anything
    else (caller falls back to PIL, then to the pseudo-decode)."""
    if b.startswith(_PNG_SIG) and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return int(w), int(h)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return int(w), int(h)
    if b[:2] == b"\xff\xd8":  # JPEG: walk segment markers to a SOF
        i = 2
        while i + 9 <= len(b) and b[i] == 0xFF:
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in _JPEG_SOF:
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return int(w), int(h)
            (seg_len,) = struct.unpack(">H", b[i + 2 : i + 4])
            i += 2 + seg_len
    return None


def _pil_dims(b: bytes) -> tuple[int, int] | None:
    if not _HAVE_PIL:
        return None
    import io

    try:
        with Image.open(io.BytesIO(b)) as img:
            return int(img.width), int(img.height)
    except Exception:
        return None


def attach_fake_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal table: utf-8 payload bytes standing in for an
    encoded image blob."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Tiered decode (see module doc): real header parse → PIL → pseudo.

    Real image payloads (PNG/GIF/JPEG) get true dimensions and
    ``n_frames=1``; unrecognized payloads get the deterministic
    pseudo-dims the oracle reproduces from the byte length. NULL payloads
    produce NO row (nothing to decode — quarantine, like the feature
    kernel; the oracles filter ``text IS NOT NULL`` to match). An EMPTY
    payload is different: byte_len 0 metadata is meaningful, so it keeps
    its row via the pseudo path.
    """
    pdf = pdf[pdf["payload"].notna()]
    blen = pdf["payload"].map(len).astype("int64")
    widths, heights, frames = [], [], []
    for b, n in zip(pdf["payload"], blen):
        dims = parse_image_dims(bytes(b)) or _pil_dims(bytes(b))
        if dims is not None:
            widths.append(dims[0])
            heights.append(dims[1])
            frames.append(1)
        else:
            widths.append(16 + n % 64)
            heights.append(16 + (n * 7) % 64)
            frames.append(1 + n % 8)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "byte_len": blen.astype("int32"),
            "width": pd.Series(widths, index=pdf.index).astype("int32"),
            "height": pd.Series(heights, index=pdf.index).astype("int32"),
            "n_frames": pd.Series(frames, index=pdf.index).astype("int32"),
        }
    )


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_offset int, frame_sig long"


def frame_sample(df_with_payload: DataFrame) -> DataFrame:
    """Video-style frame sampling: expand each payload into its (stub)
    frames — the 1→N row expansion shape of media pipelines, still
    Arrow-batched. Frame count/offsets/signatures are deterministic
    functions of the payload so the oracle can reproduce them; a real
    decoder would emit actual frame tensors here.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame_sig": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # nothing to decode -> no frames (oracle twin
                    # filters text IS NOT NULL)
                blen = len(payload)
                n = 1 + blen % 8
                for i in range(n):
                    off = (i * blen) // n
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(off)
                    out["frame_sig"].append((blen * 31 + i * 7) % 1000003)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_offset": pd.Series(out["frame_offset"], dtype="int32"),
                    "frame_sig": pd.Series(out["frame_sig"], dtype="int64"),
                }
            )

    return df_with_payload.select("doc_id", "payload").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


FRAME_ENERGY_SCHEMA = "doc_id long, frame_idx int, n_frames int, energy long"


def frame_energy(df_with_payload: DataFrame) -> DataFrame:
    """Per-frame byte-energy extraction (the scene-cut feature pass):
    expand each payload into its stub frames (same boundary arithmetic as
    :func:`frame_sample` — ``off_i = (i*blen)//n``) and reduce each
    frame's byte slice to an EXACT integer sum. This is the
    1→N-expand-then-per-slice-reduce shape of a real video feature
    pipeline (decode frame → pool features), Arrow-batched; a real
    decoder would emit per-frame tensors and pool them here.

    NULL payloads produce no rows (quarantine, matching the other
    kernels); an EMPTY payload keeps its single frame with energy 0 (the
    metadata is meaningful). Bytes are summed as unsigned ints, so the
    energy is deterministic and the DuckDB oracle reproduces it from the
    payload's hex dump.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "n_frames": [], "energy": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                blen = len(b)
                n = 1 + blen % 8
                for i in range(n):
                    lo = (i * blen) // n
                    hi = ((i + 1) * blen) // n
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["n_frames"].append(n)
                    out["energy"].append(sum(b[lo:hi]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "n_frames": pd.Series(out["n_frames"], dtype="int32"),
                    "energy": pd.Series(out["energy"], dtype="int64"),
                }
            )

    return df_with_payload.select("doc_id", "payload").mapInPandas(
        run, schema=FRAME_ENERGY_SCHEMA
    )


def image_meta(df_with_payload: DataFrame) -> DataFrame:
    """Extract typed metadata from a binary payload column via Arrow-batched
    ``mapInPandas`` (the multimodal feature-extraction pattern)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf)

    return df_with_payload.select("doc_id", "payload").mapInPandas(
        run, schema=IMAGE_META_SCHEMA
    )


RESIZE_SCHEMA = (
    "doc_id long, width int, height int, out_w int, out_h int, out_bytes int"
)


def image_resize(
    df_with_payload: DataFrame, target_w: int = 32, target_h: int = 32
) -> DataFrame:
    """Aspect-preserving resize planning via Arrow-batched ``mapInPandas``
    (STUB decode — see module doc): source dims come from the stub decode,
    output dims scale by ``min(target/w, target/h)`` exactly as a Pillow
    ``thumbnail`` kernel would, and ``out_bytes`` models the re-encoded
    size. All integer arithmetic — deterministic, so the DuckDB oracle
    reproduces it. A real deployment swaps the body for
    ``img.resize((out_w, out_h))`` + re-encode; schema and batching stay.
    """

    def run(batches):
        import numpy as np

        for pdf in batches:
            meta = _decode_batch(pdf)
            w = meta["width"].to_numpy().astype("int64")
            h = meta["height"].to_numpy().astype("int64")
            # scale = min(target_w/w, target_h/h), kept in exact integer
            # form: the binding dimension hits its target exactly, the
            # other scales by floor division (both engines reproduce this)
            width_binding = (w * target_h) >= (h * target_w)
            out_w = np.where(width_binding, target_w, (w * target_h) // h)
            out_h = np.where(width_binding, (h * target_w) // w, target_h)
            yield pd.DataFrame(
                {
                    # meta's doc_id, not pdf's: _decode_batch drops
                    # NULL-payload rows, so the frames must stay aligned
                    "doc_id": meta["doc_id"],
                    "width": meta["width"],
                    "height": meta["height"],
                    "out_w": out_w.astype("int32"),
                    "out_h": out_h.astype("int32"),
                    "out_bytes": (out_w * out_h * 3).astype("int32"),
                }
            )

    return df_with_payload.select("doc_id", "payload").mapInPandas(
        run, schema=RESIZE_SCHEMA
    )


FEATURES_DIM = 16

FEATURES_SCHEMA = "doc_id long, feat array<double>"


def image_features(df_with_payload: DataFrame) -> DataFrame:
    """Feature extraction to a fixed-dim vector via Arrow-batched
    ``mapInPandas``: a 16-bin byte-value histogram (fractions, rounded) —
    the STUB stand-in for a CNN/CLIP embedding kernel. NumPy-vectorized
    per batch (``np.frombuffer`` + ``bincount``), no per-row Python in
    the inner loop beyond the payload walk a real decoder would also do.
    The output column is ``array<double>`` — exactly the shape the ANN /
    dedup operators consume, so ``image_features`` output pipes straight
    into ``ann_*`` / ``dedup_embedding_*``.

    Empty or NULL payloads produce NO row (a real decoder quarantines an
    undecodable blob rather than emitting a degenerate all-zero
    embedding) — the same semantics the DuckDB oracles get for free from
    their per-character histogram CTEs, which contain no rows for an
    empty document.
    """
    import numpy as np

    def run(batches):
        for pdf in batches:
            ids, feats = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue  # undecodable -> dropped, matching the oracle
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr % FEATURES_DIM, minlength=FEATURES_DIM)
                # round half-AWAY like SQL ROUND (np.round is
                # half-even: 0.0390625 would flip the oracle hash)
                frac = np.floor(hist / arr.size * 1e6 + 0.5) / 1e6
                ids.append(doc_id)
                feats.append(frac.tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    # object dtype even when the batch dropped every row —
                    # an empty float64 column breaks Arrow's list<double>
                    # conversion
                    "feat": pd.Series(feats, dtype="object"),
                }
            )

    return df_with_payload.select("doc_id", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


AUDIO_META_SCHEMA = (
    "doc_id long, byte_len int, sample_rate int, n_samples int, duration_ms int"
)


def audio_meta(df_with_payload: DataFrame) -> DataFrame:
    """Audio-side twin of :func:`image_meta`: typed metadata from an opaque
    payload via Arrow-batched ``mapInPandas`` (STUB decode — a real kernel
    is ``torchaudio.info`` / ``soundfile.info``). Stub model: 16-bit mono
    PCM at a deterministic sample rate, so every derived field is integer
    arithmetic both engines reproduce.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload -> no row (quarantine; oracle filters
            # text IS NOT NULL). Empty payload keeps its 0-length row.
            pdf = pdf[pdf["payload"].notna()]
            blen = pdf["payload"].map(len).astype("int64")
            rate = (8000 * (1 + blen % 3)).astype("int64")  # 8/16/24 kHz
            n_samples = blen // 2  # 16-bit mono PCM
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": blen.astype("int32"),
                    "sample_rate": rate.astype("int32"),
                    "n_samples": n_samples.astype("int32"),
                    "duration_ms": (n_samples * 1000 // rate).astype("int32"),
                }
            )

    return df_with_payload.select("doc_id", "payload").mapInPandas(
        run, schema=AUDIO_META_SCHEMA
    )
