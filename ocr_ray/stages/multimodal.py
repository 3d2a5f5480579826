"""Multimodal (image/audio/video) column plumbing — actor-pool stages.

Media travels as opaque ``binary`` columns with typed metadata, processed
by stateful actor-pool ``map_batches`` stages exactly like the text
extractors.  The codec libraries are not available in this environment, so
the decode kernel is STUBBED: ``use_real_codec=True`` raises
``NotImplementedError`` at the single clearly-marked point a real decoder
(Pillow / ffmpeg / torchaudio) would plug into, while the default
deterministic fake keeps all Ray-side plumbing — schema, batch signature,
actor lifecycle, batch sizing for large payloads, output layout — real and
tested.

Scale note: media rows are large, so callers must use a SMALL batch_size
(tens, not thousands) and ``batch_format="pyarrow"`` to keep payload bytes
zero-copy in the object store until the decode touches them.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

MEDIA_FEATURES_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("n_bytes", pa.int64()),
        pa.field("content_hash", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("n_frames", pa.int32()),
        pa.field("decode_status", pa.string()),
    ]
)


class MediaFeatureExtractor:
    """Actor-pool stage: binary media column → feature columns.

    __init__ is the once-per-actor slot where a real model/codec would
    load; __call__ handles one Arrow batch.
    """

    def __init__(self, media_col: str = "media", id_col: str = "media_id",
                 use_real_codec: bool = False) -> None:
        self.media_col = media_col
        self.id_col = id_col
        self.use_real_codec = use_real_codec

    def _decode(self, payload: bytes) -> tuple[int, int, int, str]:
        """→ (width, height, n_frames, status).

        STUB: a real implementation decodes the container here.  The fake
        derives deterministic dimensions from the content hash so tests can
        pin output without any codec library.
        """
        if self.use_real_codec:
            raise NotImplementedError(
                "no image/audio codec libraries in this environment; "
                "plug Pillow/ffmpeg here"
            )
        if not payload:
            return 0, 0, 0, "empty"
        h = hashlib.md5(payload).digest()
        width = 16 * (1 + h[0] % 64)       # 16..1024, deterministic
        height = 16 * (1 + h[1] % 64)
        n_frames = 1 + h[2] % 4
        return width, height, n_frames, "ok"

    def __call__(self, batch: pa.Table) -> pa.Table:
        media = batch[self.media_col]
        if isinstance(media, pa.ChunkedArray):
            media = media.combine_chunks()
        ids = batch[self.id_col].to_pylist()
        payloads = media.to_pylist()
        widths, heights, frames, statuses, hashes = [], [], [], [], []
        for p in payloads:
            p = p or b""
            w, h, f, s = self._decode(p)
            widths.append(w)
            heights.append(h)
            frames.append(f)
            statuses.append(s)
            hashes.append(hashlib.md5(p).hexdigest())
        return pa.table(
            {
                "media_id": pa.array([str(i) for i in ids], pa.string()),
                "n_bytes": pc.cast(pc.binary_length(media), pa.int64()),
                "content_hash": pa.array(hashes, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "n_frames": pa.array(frames, pa.int32()),
                "decode_status": pa.array(statuses, pa.string()),
            },
            schema=MEDIA_FEATURES_SCHEMA,
        )


def media_features(ds, media_col: str = "media", id_col: str = "media_id",
                   batch_size: int = 32, concurrency=(2, 8)):
    """Dataset-level wrapper: small batches for large binary payloads."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_args=(media_col, id_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
