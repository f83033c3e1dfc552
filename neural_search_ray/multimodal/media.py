"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference ingests base64 images through text_image_embedding
(processor/TextImageEmbeddingProcessor.java); at training-data scale the
equivalent is binary media columns decoded/featurized by actor-pool
map_batches stages.

The image/audio codec libraries are NOT in this container, so the decode
kernel itself is STUBBED: ``MediaDecodeStage`` takes a ``decoder``
callable — the real deployment passes PIL/ffmpeg wrappers; tests pass
``FakeImageDecoder`` (deterministic pseudo-pixels from the byte hash) or
assert ``NotImplementedError`` from the default. Everything AROUND the
kernel — schema, batch sizing, actor-pool signature, output layout — is
real and tested.

Scale notes: media rows are wide (MBs), so stages must run with small
``batch_size`` (e.g. 16-64) and ``num_cpus`` sized for the decode lib;
outputs (features) are narrow — project the binary column away in the
same stage, exactly like the html column in corpus/extract.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image | audio | video
        ("mime", pa.string()),
        ("width", pa.int32()),          # -1 when unknown / n/a
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
        ("payload", pa.binary()),
    ]
)


def _not_implemented_decoder(payload: bytes, mime: str) -> np.ndarray:
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in this "
        "environment; pass decoder= to MediaDecodeStage"
    )


class FakeImageDecoder:
    """Deterministic stand-in: pseudo-pixels derived from md5(payload).

    Returns a (h, w, 3) uint8 array — enough to exercise resize /
    feature-extract plumbing without a codec library.
    """

    def __init__(self, width: int = 8, height: int = 8):
        self.width = width
        self.height = height

    def __call__(self, payload: bytes, mime: str) -> np.ndarray:
        seed = np.frombuffer(hashlib.md5(payload).digest(), dtype=np.uint8)
        reps = int(np.ceil(self.width * self.height * 3 / seed.size))
        flat = np.tile(seed, reps)[: self.width * self.height * 3]
        return flat.reshape(self.height, self.width, 3)


class MediaDecodeStage:
    """Actor-pool map_batches stage: decode → mean-channel feature.

    Usage:
      ds.map_batches(MediaDecodeStage,
                     fn_constructor_kwargs=dict(decoder=FakeImageDecoder()),
                     concurrency=N, batch_size=32, batch_format="pyarrow")
    Output: (media_id, kind, feat: list<float>) — payload projected away.
    """

    def __init__(self, decoder=None):
        self.decoder = decoder or _not_implemented_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        mimes = batch["mime"].to_pylist()
        payloads = batch["payload"].to_pylist()
        feats = []
        for p, m in zip(payloads, mimes):
            arr = self.decoder(p or b"", m)
            feats.append(np.asarray(arr, dtype=np.float64).mean(axis=(0, 1)).tolist())
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "kind": pa.array(kinds, type=pa.string()),
                "feat": pa.array(feats, type=pa.list_(pa.float64())),
            }
        )


def media_from_documents(batch: pa.Table) -> pa.Table:
    """Deterministic media table synthesized from a (doc_id, text,
    n_chars) documents batch — the fixture that lets the multimodal
    PLUMBING run through the DuckDB-oracle gate without codec libs:
    kind cycles by doc_id % 3 (image/audio/video), payload = utf8 text
    bytes, video duration = n_chars * 10 ms."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    kinds_all = np.asarray(["image", "audio", "video"], dtype=object)
    mimes_all = np.asarray(["image/png", "audio/wav", "video/mp4"], dtype=object)
    sel = ids % 3
    n_chars = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    is_video = sel == 2
    is_image = sel == 0
    return pa.table(
        {
            "media_id": pa.array(ids),
            "kind": pa.array(list(kinds_all[sel]), type=pa.string()),
            "mime": pa.array(list(mimes_all[sel]), type=pa.string()),
            "width": pa.array(np.where(is_image, 8, -1).astype(np.int32)),
            "height": pa.array(np.where(is_image, 8, -1).astype(np.int32)),
            "duration_ms": pa.array(
                np.where(is_video, n_chars * 10, -1).astype(np.int32)
            ),
            "payload": pa.array(
                [t.encode("utf-8") if t else b"" for t in batch["text"].to_pylist()],
                type=pa.binary(),
            ),
        }
    )


def frame_sample_stage(batch: pa.Table, every_ms: int = 1000) -> pa.Table:
    """Video frame-sampling plumbing: emit one row per sampled frame
    timestamp (decode itself is the stubbed kernel above). Pure function
    of (duration_ms, every_ms) — exercises the explode layout."""
    ids, kinds, ts = [], [], []
    for mid, kind, dur in zip(
        batch["media_id"].to_pylist(),
        batch["kind"].to_pylist(),
        batch["duration_ms"].to_pylist(),
    ):
        if kind != "video" or not dur or dur <= 0:
            continue
        for t in range(0, dur, every_ms):
            ids.append(mid)
            kinds.append(kind)
            ts.append(t)
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "frame_ts_ms": pa.array(ts, type=pa.int32()),
        }
    )
