"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads ride as Arrow ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample are
actor-pool ``map_batches`` stages. The image/audio libs are NOT in this
container, so the codec boundary is stubbed two ways (both
clearly marked):

- ``DecodeImage(real=True)`` raises ``NotImplementedError`` at the
  exact call site where Pillow/libav would be invoked;
- ``DecodeImage(real=False)`` (default) produces a deterministic fake
  decode (dims/format derived from the payload hash) so the Ray-side
  plumbing — schema, batch sizing, actor signature, output layout — is
  real and tested end-to-end.

Scale notes: payload rows are wide → these stages want SMALL
``batch_size`` (64-256) and ``large_binary``-tolerant handling; keep
``batch_size × concurrency × payload`` under the worker heap and let
the object store spill blocks, never the Python heap.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_META_TYPE = pa.struct(
    [
        ("media_type", pa.string()),  # image | audio | video
        ("format", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.binary()),
        ("meta", MEDIA_META_TYPE),
    ]
)

_FORMATS = ["jpeg", "png", "webp"]


def synth_media_batch(
    t: pa.Table,
    media_type: str = "image",
    fmt: str | None = None,
    ms_per_char: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """STREAMING form of :func:`synth_media_table`: one vectorized Arrow
    pass over a (doc_id, text) batch → MEDIA_SCHEMA rows. Used inside
    ``map_batches`` over the documents read, so deriving the media
    fixture never pulls the table to the driver (round-2 verdict). The
    payload is the text bytes (the declared deterministic stand-in);
    video/audio duration = ``ms_per_char`` × char count, image dims are
    md5-derived exactly as in :func:`synth_media_table`."""
    import pyarrow.compute as pc

    txt = pc.coalesce(
        pc.cast(t.column(text_col), pa.string()), pa.scalar("", pa.string())
    )
    ids = pc.cast(t.column(id_col), pa.string())
    payload = pc.cast(txt, pa.binary())
    n = t.num_rows
    if media_type == "image":
        fmts, widths, heights = [], [], []
        for b in payload.to_pylist():  # md5-derived fake dims (stub fixture)
            h = hashlib.md5(b).digest()
            fmts.append(_FORMATS[h[0] % 3])
            widths.append(64 + int.from_bytes(h[1:3], "big") % 1856)
            heights.append(64 + int.from_bytes(h[3:5], "big") % 1016)
        meta = pa.StructArray.from_arrays(
            [
                pa.array(["image"] * n, pa.string()),
                pa.array(fmts, pa.string()),
                pa.array(widths, pa.int32()),
                pa.array(heights, pa.int32()),
                pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
            ],
            fields=list(MEDIA_META_TYPE),
        )
    else:
        nchars = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
        dur = (ms_per_char * nchars).astype(np.int32)
        meta = pa.StructArray.from_arrays(
            [
                pa.array([media_type] * n, pa.string()),
                pa.array([fmt or ("wav" if media_type == "audio" else "mp4")] * n),
                pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
                pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
                pa.array(dur, pa.int32()),
            ],
            fields=list(MEDIA_META_TYPE),
        )
    return pa.Table.from_arrays([ids, payload, meta], schema=MEDIA_SCHEMA)


def synth_media_table(doc_ids: list[str], texts: list[str]) -> pa.Table:
    """Deterministic fake payloads (text bytes as stand-in blobs) with
    hash-derived metadata — the sandbox source for multimodal tests."""
    payloads, metas = [], []
    for t in texts:
        b = (t or "").encode("utf-8")
        h = hashlib.md5(b).digest()
        payloads.append(b)
        metas.append(
            {
                "media_type": "image",
                "format": _FORMATS[h[0] % 3],
                "width": 64 + int.from_bytes(h[1:3], "big") % 1856,
                "height": 64 + int.from_bytes(h[3:5], "big") % 1016,
                "duration_ms": 0,
            }
        )
    return pa.Table.from_arrays(
        [
            pa.array([str(d) for d in doc_ids], pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(metas, MEDIA_META_TYPE),
        ],
        schema=MEDIA_SCHEMA,
    )


class DecodeImage:
    """Actor-pool decode stage. ``map_batches(DecodeImage, concurrency=N,
    batch_size=128, num_cpus=1)`` — decoder state loads once per actor."""

    def __init__(self, real: bool = False):
        self.real = real
        if real:
            # STUB: no imaging libs in this container.
            raise NotImplementedError(
                "real image decode requires Pillow/torchvision — not in "
                "this environment; construct with real=False for the "
                "deterministic fake decoder"
            )

    def _decode(self, payload: bytes) -> tuple[int, int, str]:
        h = hashlib.md5(payload).digest()
        return (
            64 + int.from_bytes(h[1:3], "big") % 1856,
            64 + int.from_bytes(h[3:5], "big") % 1016,
            _FORMATS[h[0] % 3],
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        w, ht, fmt = [], [], []
        for p in payloads:
            a, b, c = self._decode(p or b"")
            w.append(a)
            ht.append(b)
            fmt.append(c)
        return (
            batch.append_column("decoded_width", pa.array(w, pa.int32()))
            .append_column("decoded_height", pa.array(ht, pa.int32()))
            .append_column("decoded_format", pa.array(fmt, pa.string()))
        )


class ResizePlan:
    """Compute-only resize stage: target dims preserving aspect ratio
    (the arithmetic is real; pixel work is behind the decode stub)."""

    def __init__(self, max_side: int = 512):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch.column("decoded_width").to_numpy().astype(np.float64)
        h = batch.column("decoded_height").to_numpy().astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        # floor(x + 0.5): round-half-UP, matching SQL round() — np.round's
        # banker's rounding would diverge from the DuckDB oracle on .5
        return batch.append_column(
            "resize_width", pa.array(np.floor(w * scale + 0.5).astype(np.int32))
        ).append_column(
            "resize_height", pa.array(np.floor(h * scale + 0.5).astype(np.int32))
        )


class AudioChunkPlan:
    """Audio chunking plan: fixed-length windows over the clip duration
    (the ASR/embedding pre-segmentation shape — plumbing for a real
    libsndfile/torchaudio actor, which is behind the declared codec
    stub like :class:`DecodeImage`). Emits ``chunks`` as a
    ``list<struct<chunk_no,start_ms,end_ms>>`` column; the final partial
    window is kept (ASR wants the tail), and ``max_chunks`` bounds the
    per-row explosion exactly like ``max_frames`` above."""

    def __init__(self, chunk_ms: int = 2000, max_chunks: int = 32):
        self.chunk_ms = chunk_ms
        self.max_chunks = max_chunks

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = batch.column("meta").to_pylist()
        chunks = []
        for m in metas:
            dur = m["duration_ms"]
            if m["media_type"] != "audio" or dur <= 0:
                chunks.append([])
                continue
            starts = range(0, min(dur, self.chunk_ms * self.max_chunks), self.chunk_ms)
            chunks.append(
                [
                    {
                        "chunk_no": i,
                        "start_ms": s,
                        "end_ms": min(s + self.chunk_ms, dur),
                    }
                    for i, s in enumerate(starts)
                ]
            )
        return batch.append_column(
            "chunks",
            pa.array(
                chunks,
                pa.list_(
                    pa.struct(
                        [
                            ("chunk_no", pa.int64()),
                            ("start_ms", pa.int32()),
                            ("end_ms", pa.int32()),
                        ]
                    )
                ),
            ),
        )


class FrameSamplePlan:
    """Video frame-sampling plan: every ``fps_divisor``-th frame index up
    to duration (plumbing for a real ffmpeg actor)."""

    def __init__(self, frame_interval_ms: int = 1000, max_frames: int = 16):
        self.interval = frame_interval_ms
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = batch.column("meta").to_pylist()
        frames = [
            list(range(0, min(m["duration_ms"], self.interval * self.max_frames), self.interval))
            if m["media_type"] == "video"
            else []
            for m in metas
        ]
        return batch.append_column(
            "sample_frames_ms", pa.array(frames, pa.list_(pa.int32()))
        )
