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
                # null payloads decode as b'' (status='empty') — n_bytes must
                # agree (0, not null) so null and empty rows are identical
                "n_bytes": pc.coalesce(
                    pc.cast(pc.binary_length(media), pa.int64()), pa.scalar(0, pa.int64())
                ),
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


class MediaResizeStage:
    """Actor-pool stage: media → resized media (stubbed transcode).

    Real plumbing: binary in/binary out with target-dimension metadata, small
    batches for large payloads.  The stub 'resize' truncates the payload
    proportionally to the area ratio — deterministic, shape-preserving for
    tests; a real implementation decodes + scales at the marked point.
    """

    def __init__(self, target_w: int = 256, target_h: int = 256,
                 media_col: str = "media", id_col: str = "media_id",
                 use_real_codec: bool = False) -> None:
        self.target_w = target_w
        self.target_h = target_h
        self.media_col = media_col
        self.id_col = id_col
        self.use_real_codec = use_real_codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.use_real_codec:
            raise NotImplementedError("plug Pillow resize here")
        fx = MediaFeatureExtractor(self.media_col, self.id_col)
        feats = fx(batch)
        media = batch[self.media_col]
        if isinstance(media, pa.ChunkedArray):
            media = media.combine_chunks()
        out_payloads = []
        for payload, w, h in zip(media.to_pylist(),
                                 feats["width"].to_pylist(),
                                 feats["height"].to_pylist()):
            payload = payload or b""
            if w and h:
                ratio = min(1.0, (self.target_w * self.target_h) / (w * h))
                out_payloads.append(payload[: max(1, int(len(payload) * ratio))])
            else:
                out_payloads.append(payload)
        return pa.table({
            "media_id": feats["media_id"],
            "media": pa.array(out_payloads, pa.binary()),
            "width": pa.array([min(self.target_w, w or 0) for w in feats["width"].to_pylist()], pa.int32()),
            "height": pa.array([min(self.target_h, h or 0) for h in feats["height"].to_pylist()], pa.int32()),
        })


class FrameSampleStage:
    """Actor-pool stage: video media row → one row PER SAMPLED FRAME (the
    1→N explosion pattern for frame-level downstream models).

    Stubbed decode: frame count comes from the deterministic fake; each
    sampled frame row carries (media_id, frame_idx, frame_hash).  Small
    batch_size is mandatory — output rows multiply by n_frames/stride.
    """

    def __init__(self, stride: int = 2, media_col: str = "media",
                 id_col: str = "media_id") -> None:
        self.stride = stride
        self.media_col = media_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        fx = MediaFeatureExtractor(self.media_col, self.id_col)
        feats = fx(batch)
        ids, idxs, hashes = [], [], []
        for mid, n_frames, chash in zip(feats["media_id"].to_pylist(),
                                        feats["n_frames"].to_pylist(),
                                        feats["content_hash"].to_pylist()):
            for f in range(0, n_frames, self.stride):
                ids.append(mid)
                idxs.append(f)
                hashes.append(hashlib.md5(f"{chash}:{f}".encode()).hexdigest())
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame_hash": pa.array(hashes, pa.string()),
        })
