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


def media_pipeline(sf_dir: str, *, concurrency: int = 2):
    """docs -> explode media spans -> featurize (actor pool)."""
    from ..sources.docs import read_docs

    ds = read_docs(sf_dir)
    media = ds.map_batches(explode_media_spans, batch_format="pyarrow", zero_copy_batch=True)
    return media.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"decode": "fake"},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
