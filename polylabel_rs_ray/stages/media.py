"""Multimodal span processing: explode interleaved docs into media rows,
featurize media payloads in an actor pool.

The image/audio decode libraries do not exist in this container, so the
decode step is STUBBED (``decode="real"`` raises NotImplementedError); the
default ``decode="fake"`` produces a deterministic feature vector from the
media_ref bytes.  Everything around the stub — the span explode, the actor
signature, batch sizing, the output schema, the per-kind rollup — is real
and tested, so swapping in a real decoder is a one-function change.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .util import actor_concurrency

MEDIA_FEATURE_DIM = 8


def explode_media_spans(batch: pa.Table) -> pa.Table:
    """One output row per NON-text span: (doc_num, span_offset, kind,
    media_ref).  Vectorized via list-offset arithmetic."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    counts = pc.list_value_length(spans).to_numpy().astype(np.int64)
    doc_num = np.repeat(batch.column("doc_num").to_numpy(), counts)
    flat = spans.flatten()
    kind = flat.field("kind")
    ref = flat.field("media_ref")
    offset = flat.field("offset")
    mask = pc.invert(pc.equal(kind, "text"))
    t = pa.table({
        "doc_num": pa.array(doc_num, type=pa.int64()),
        "span_offset": pc.cast(offset, pa.int64()),
        "kind": kind,
        "media_ref": ref,
    })
    return t.filter(mask)


class MediaFeaturizer:
    """Actor-pool stage: media_ref -> feature vector.

    ``decode="real"`` is the hook for actual image/audio decoding (PIL /
    torchaudio / ffmpeg) — unavailable here, raises NotImplementedError.
    ``decode="fake"`` derives MEDIA_FEATURE_DIM floats in [0, 1) from
    blake2b(media_ref) — deterministic, schema-identical to the real path."""

    def __init__(self, decode: str = "fake"):
        if decode not in ("fake", "real"):
            raise ValueError(decode)
        self.decode = decode

    def _featurize(self, ref: str) -> np.ndarray:
        if self.decode == "real":
            raise NotImplementedError(
                "real media decode requires image/audio libs absent from this "
                "environment; the fake path preserves schema and plumbing"
            )
        raw = hashlib.blake2b(ref.encode(), digest_size=MEDIA_FEATURE_DIM * 2).digest()
        vals = np.frombuffer(raw, dtype=np.uint16).astype(np.float64)
        return vals / 65536.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        feats = np.empty((len(refs), MEDIA_FEATURE_DIM))
        for i, r in enumerate(refs):
            feats[i] = self._featurize(r or "")
        flat = pa.array(feats.ravel(), type=pa.float64())
        col = pa.FixedSizeListArray.from_arrays(flat, MEDIA_FEATURE_DIM)
        return batch.append_column("features", col)


def media_pipeline(sf_dir: str, *, concurrency=None):
    """docs -> explode media spans -> featurize (actor pool)."""
    from ..sources.docs import read_docs

    ds = read_docs(sf_dir)
    media = ds.map_batches(explode_media_spans, batch_format="pyarrow", zero_copy_batch=True)
    return media.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"decode": "fake"},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency or actor_concurrency(),
    )


class FrameSampler:
    """Actor-pool stage: video span -> N sampled frame rows, resized.

    The video-decode hook mirrors MediaFeaturizer: ``decode="real"`` is
    where ffmpeg/pyav frame extraction plugs in (absent here, raises);
    ``decode="fake"`` synthesizes a deterministic width*height*3 RGB
    payload per (media_ref, frame_idx).  The Ray-side plumbing is real:
    one row per sampled frame, an opaque ``binary`` payload column with
    typed metadata, and the stage is meant to run with a SMALL batch_size
    (frames are width*height*3 bytes each; batch x concurrency must fit
    the worker heap — at real resolutions use batch_size<=64)."""

    def __init__(self, n_frames: int = 4, width: int = 32, height: int = 18,
                 decode: str = "fake"):
        if decode not in ("fake", "real"):
            raise ValueError(decode)
        self.n_frames = n_frames
        self.width = width
        self.height = height
        self.decode = decode

    def _frame(self, ref: str, idx: int) -> bytes:
        if self.decode == "real":
            raise NotImplementedError(
                "real video decode requires ffmpeg/pyav absent from this "
                "environment; the fake path preserves schema and plumbing"
            )
        need = self.width * self.height * 3
        seed = hashlib.blake2b(f"{ref}:{idx}".encode(), digest_size=32).digest()
        reps = -(-need // len(seed))
        return (seed * reps)[:need]

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch.filter(pc.equal(batch.column("kind"), "video"))
        n = vids.num_rows
        doc_num = np.repeat(vids.column("doc_num").to_numpy(), self.n_frames)
        span_off = np.repeat(vids.column("span_offset").to_numpy(), self.n_frames)
        refs = vids.column("media_ref").to_pylist()
        frame_idx = np.tile(np.arange(self.n_frames, dtype=np.int64), n)
        payloads = [
            self._frame(refs[i] or "", j)
            for i in range(n) for j in range(self.n_frames)
        ]
        return pa.table({
            "doc_num": pa.array(doc_num, type=pa.int64()),
            "span_offset": pa.array(span_off, type=pa.int64()),
            "frame_idx": pa.array(frame_idx, type=pa.int64()),
            "width": pa.array(np.full(len(payloads), self.width), type=pa.int32()),
            "height": pa.array(np.full(len(payloads), self.height), type=pa.int32()),
            "frame": pa.array(payloads, type=pa.binary()),
        })


class ImageResizer:
    """Actor-pool stage: image span -> one fixed-WxH RGB payload row.

    The resize hook mirrors the other media stages: ``decode="real"`` is
    where PIL/opencv decode+resize plugs in (absent here, raises);
    ``decode="fake"`` synthesizes a deterministic width*height*3 payload
    from blake2b(media_ref).  Output carries the original-size metadata
    columns a real decoder would fill."""

    def __init__(self, width: int = 64, height: int = 64, decode: str = "fake"):
        if decode not in ("fake", "real"):
            raise ValueError(decode)
        self.width = width
        self.height = height
        self.decode = decode

    def _rgb(self, ref: str) -> bytes:
        if self.decode == "real":
            raise NotImplementedError(
                "real image decode requires PIL/opencv absent from this "
                "environment; the fake path preserves schema and plumbing"
            )
        need = self.width * self.height * 3
        seed = hashlib.blake2b(ref.encode(), digest_size=32).digest()
        reps = -(-need // len(seed))
        return (seed * reps)[:need]

    def __call__(self, batch: pa.Table) -> pa.Table:
        imgs = batch.filter(pc.equal(batch.column("kind"), "image"))
        refs = imgs.column("media_ref").to_pylist()
        n = imgs.num_rows
        payloads = [self._rgb(r or "") for r in refs]
        # deterministic fake "original" dims derived from the ref
        orig = np.array(
            [int.from_bytes(hashlib.blake2b((r or "").encode(),
                                            digest_size=2).digest(), "little")
             for r in refs],
            dtype=np.int64,
        )
        return pa.table({
            "doc_num": pc.cast(imgs.column("doc_num"), pa.int64()),
            "span_offset": pc.cast(imgs.column("span_offset"), pa.int64()),
            "orig_width": pa.array(64 + orig % 1024, type=pa.int32()),
            "orig_height": pa.array(64 + (orig // 1024) % 1024, type=pa.int32()),
            "width": pa.array(np.full(n, self.width), type=pa.int32()),
            "height": pa.array(np.full(n, self.height), type=pa.int32()),
            "rgb": pa.array(payloads, type=pa.binary()),
        })


class AudioChunker:
    """Actor-pool stage: audio span -> fixed-duration PCM chunk rows.

    Completes the media trio (image featurize / video frame-sample /
    audio chunk): ``decode="real"`` is the hook for actual waveform
    decode+resample (torchaudio / soundfile / ffmpeg — absent here,
    raises); ``decode="fake"`` synthesizes deterministic int16 PCM from
    blake2b(media_ref, chunk_idx).  Chunk count per clip is derived
    deterministically from the ref (1..max_chunks), standing in for
    duration/chunk_len.  Payloads are n_samples*2 bytes each — run with
    a small batch_size at real sample rates."""

    def __init__(self, sample_rate: int = 16_000, chunk_s: float = 0.25,
                 max_chunks: int = 4, decode: str = "fake"):
        if decode not in ("fake", "real"):
            raise ValueError(decode)
        self.sample_rate = sample_rate
        self.n_samples = int(sample_rate * chunk_s)
        self.max_chunks = max_chunks
        self.decode = decode

    def _n_chunks(self, ref: str) -> int:
        # fake-decode stand-in for clip duration: md5 low 8 bytes (LE) so a
        # DuckDB oracle can replay it exactly (md5_number_lower(ref)); a
        # real decoder replaces this with duration-derived chunking behind
        # the decode switch
        h = hashlib.md5(ref.encode()).digest()[8:]
        return 1 + int.from_bytes(h, "little") % self.max_chunks

    def _chunk(self, ref: str, idx: int) -> bytes:
        if self.decode == "real":
            raise NotImplementedError(
                "real audio decode requires torchaudio/soundfile absent from "
                "this environment; the fake path preserves schema and plumbing"
            )
        need = self.n_samples * 2  # int16 mono PCM
        seed = hashlib.blake2b(f"{ref}:{idx}".encode(), digest_size=32).digest()
        reps = -(-need // len(seed))
        return (seed * reps)[:need]

    def __call__(self, batch: pa.Table) -> pa.Table:
        auds = batch.filter(pc.equal(batch.column("kind"), "audio"))
        refs = auds.column("media_ref").to_pylist()
        counts = np.array([self._n_chunks(r or "") for r in refs], dtype=np.int64)
        doc_num = np.repeat(auds.column("doc_num").to_numpy(), counts)
        span_off = np.repeat(auds.column("span_offset").to_numpy(), counts)
        total = int(counts.sum())
        seg = np.r_[0, np.cumsum(counts[:-1])] if len(counts) else np.array([], dtype=np.int64)
        chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(seg, counts)
        payloads = [
            self._chunk(refs[i] or "", j)
            for i in range(len(refs)) for j in range(int(counts[i]))
        ]
        return pa.table({
            "doc_num": pa.array(doc_num, type=pa.int64()),
            "span_offset": pa.array(span_off, type=pa.int64()),
            "chunk_idx": pa.array(chunk_idx, type=pa.int64()),
            "sample_rate": pa.array(
                np.full(total, self.sample_rate), type=pa.int32()
            ),
            "n_samples": pa.array(np.full(total, self.n_samples), type=pa.int64()),
            "pcm": pa.array(payloads, type=pa.binary()),
        })


def audio_pipeline(sf_dir: str, *, concurrency=None):
    """docs -> explode media spans -> chunk audio (actor pool, small
    batches for the PCM payloads)."""
    from ..sources.docs import read_docs

    ds = read_docs(sf_dir)
    media = ds.map_batches(explode_media_spans, batch_format="pyarrow",
                           zero_copy_batch=True)
    return media.map_batches(
        AudioChunker,
        fn_constructor_kwargs={"decode": "fake"},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=256,  # chunks explode rows x n_samples*2 bytes
        concurrency=concurrency or actor_concurrency(),
    )


def frame_pipeline(sf_dir: str, *, n_frames: int = 4, concurrency=None):
    """docs -> explode media spans -> sample+resize frames (actor pool,
    small batches for the binary payloads)."""
    from ..sources.docs import read_docs

    ds = read_docs(sf_dir)
    media = ds.map_batches(explode_media_spans, batch_format="pyarrow",
                           zero_copy_batch=True)
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames, "decode": "fake"},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=256,  # frames explode rows x W*H*3 bytes; keep batches small
        concurrency=concurrency or actor_concurrency(),
    )
