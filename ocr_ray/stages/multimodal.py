"""Multimodal (image/audio/video) column stages — actor-pool map_batches.

Media travels as opaque ``binary`` columns with typed metadata, processed
by stateful actor-pool ``map_batches`` stages exactly like the text
extractors.  Container HEADER decode is REAL and stdlib-only:
:func:`parse_media_header` reads PNG IHDR, GIF logical-screen (+ graphic
-control-extension frame count) and JPEG SOF dimensions directly from the
bytes.  Only pixel-level work (the resize transcode) remains a declared
stub behind ``use_real_codec`` — the actual codec libraries (Pillow /
ffmpeg) are not in this environment.

Hash discipline: ``content_hash`` is md5 over the LOWERCASE HEX of the
payload rather than the raw bytes — bijective with the content, and
reproducible by a pure-SQL oracle (DuckDB md5 only accepts VARCHAR, so a
raw-bytes hash could never be cross-checked there).

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

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_GIF_SIGS = (b"GIF87a", b"GIF89a")
_GIF_GCE = b"\x21\xf9\x04"  # graphic control extension: one per frame
_JPEG_SOI = b"\xff\xd8"
_JPEG_SOF = frozenset((0xC0, 0xC1, 0xC2, 0xC3))  # baseline..lossless SOF


def _gif_frames(payload: bytes) -> int:
    """GCE-block frame count via a STRUCTURED walk of the GIF data stream
    (never a raw byte-pattern scan: the ``21 f9 04`` pattern can occur by
    coincidence inside the w/h header bytes — w >= 63744 with h ≡ 4 mod
    256 — or inside a non-UTF-8 body).  Walks logical-screen descriptor →
    optional global color table → extension / image-descriptor blocks,
    counting graphic-control extensions; stops tolerantly at the first
    byte that is not valid GIF block structure (e.g. a synthetic body)."""
    if len(payload) < 13:
        return 1
    packed = payload[10]
    pos = 13
    if packed & 0x80:                       # global color table present
        pos += 3 * (1 << ((packed & 0x07) + 1))
    frames = 0
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b == 0x21 and pos + 1 < n:       # extension block
            if payload[pos + 1] == 0xF9:
                frames += 1
            pos += 2
            while pos < n:                  # sub-blocks until terminator
                size = payload[pos]
                pos += 1 + size
                if size == 0:
                    break
        elif b == 0x2C and pos + 9 < n:     # image descriptor
            lct = payload[pos + 9]
            pos += 10
            if lct & 0x80:
                pos += 3 * (1 << ((lct & 0x07) + 1))
            pos += 1                        # LZW minimum code size
            while pos < n:                  # LZW data sub-blocks
                size = payload[pos]
                pos += 1 + size
                if size == 0:
                    break
        elif b == 0x3B:                     # trailer
            break
        else:                               # not GIF structure (body bytes)
            break
    return max(1, frames)


_JPEG_STANDALONE = frozenset((0x01, *range(0xD0, 0xD8)))  # TEM, RST0-7


def parse_media_header(payload: bytes) -> tuple[int, int, int, str]:
    """(width, height, n_frames, status) from real container headers.

    PNG: IHDR width/height (bytes 16..24, big-endian).  GIF: logical
    screen width/height (bytes 6..10, little-endian), frames counted by a
    structured block walk (:func:`_gif_frames` — immune to GCE-pattern
    coincidences in header or body bytes).  JPEG: marker walk to the
    first SOF segment (height then width big-endian), skipping 0xFF fill
    bytes and the length-less standalone markers (TEM, RST0-7).  Unknown
    magic → ``unsupported``; truncated or malformed headers → ``corrupt``.
    """
    if not payload:
        return 0, 0, 0, "empty"
    if payload[:8] == _PNG_SIG:
        if len(payload) >= 24 and payload[12:16] == b"IHDR":
            w = int.from_bytes(payload[16:20], "big")
            h = int.from_bytes(payload[20:24], "big")
            return w, h, 1, "ok"
        return 0, 0, 0, "corrupt"
    if payload[:6] in _GIF_SIGS:
        if len(payload) >= 10:
            w = int.from_bytes(payload[6:8], "little")
            h = int.from_bytes(payload[8:10], "little")
            return w, h, _gif_frames(payload), "ok"
        return 0, 0, 0, "corrupt"
    if payload[:2] == _JPEG_SOI:
        i = 2
        n = len(payload)
        while i + 1 < n and payload[i] == 0xFF:
            while i + 1 < n and payload[i + 1] == 0xFF:
                i += 1                       # 0xFF fill bytes before marker
            marker = payload[i + 1]
            if marker in _JPEG_SOF:
                if i + 9 <= n:
                    h = int.from_bytes(payload[i + 5 : i + 7], "big")
                    w = int.from_bytes(payload[i + 7 : i + 9], "big")
                    return w, h, 1, "ok"
                break                        # truncated SOF
            if marker == 0xD9:               # EOI before any SOF
                break
            if marker in _JPEG_STANDALONE:   # no length field
                i += 2
                continue
            if i + 4 > n:
                break                        # truncated segment header
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if seg_len < 2:
                break                        # malformed length
            i += 2 + seg_len
        return 0, 0, 0, "corrupt"
    return 0, 0, 0, "unsupported"


def synth_media_payload(kind: int, w: int, h: int, n_frames: int,
                        body: bytes) -> bytes:
    """Deterministic well-formed media payload with REAL headers (the test
    corpus generator — also mirrored hex-for-hex by the SQL oracle).

    kind 0 → PNG (IHDR, zeroed CRC), 1 → GIF89a (n_frames GCE blocks),
    2 → JPEG (APP0/JFIF + SOF0).  ``body`` is appended verbatim.
    """
    if kind == 0:
        return (_PNG_SIG + b"\x00\x00\x00\x0d" + b"IHDR"
                + w.to_bytes(4, "big") + h.to_bytes(4, "big")
                + b"\x08\x02\x00\x00\x00" + b"\x00\x00\x00\x00" + body)
    if kind == 1:
        return (b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
                + b"\x00\x00\x00"
                + (_GIF_GCE + b"\x00\x00\x00\x00\x00") * n_frames
                + body + b"\x3b")
    return (_JPEG_SOI
            + b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
            + b"\xff\xc0\x00\x11\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big")
            + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01" + body + b"\xff\xd9")


class MediaFeatureExtractor:
    """Actor-pool stage: binary media column → feature columns.

    __init__ is the once-per-actor slot where a real pixel decoder /
    model would load; __call__ handles one Arrow batch.  Header parsing
    (dimensions, frame count, status) is real — see
    :func:`parse_media_header`.
    """

    def __init__(self, media_col: str = "media", id_col: str = "media_id") -> None:
        self.media_col = media_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, payloads, hashes, n_bytes = _media_batch_common(
            batch, self.media_col, self.id_col)
        widths, heights, frames, statuses = [], [], [], []
        for p in payloads:
            w, h, f, s = parse_media_header(p)
            widths.append(w)
            heights.append(h)
            frames.append(f)
            statuses.append(s)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "n_bytes": n_bytes,
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

    Real plumbing: binary in/binary out with target-dimension metadata and
    REAL header-parsed source dimensions; small batches for large
    payloads.  The 'resize' itself is the one declared stub left in this
    module — it truncates the payload proportionally to the area ratio
    (deterministic, shape-preserving for tests); ``use_real_codec=True``
    raises at the single point a Pillow/ffmpeg transcode would plug into.
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

    Frame count comes from the real header parse (GIF GCE blocks; single
    frame for still formats); each sampled frame row carries (media_id,
    frame_idx, frame_hash).  Small batch_size is mandatory — output rows
    multiply by n_frames/stride.
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


# ---------------------------------------------------------------------------
# Audio (WAV / RIFF) — the audio member of the multimodal family
# ---------------------------------------------------------------------------

def _media_batch_common(batch: pa.Table, media_col: str, id_col: str):
    """Shared scaffolding of the three media feature stages: combined
    payload array, stringified ids, md5-over-lowercase-hex content hashes
    (DuckDB md5 cannot take BLOBs — hashing the hex keeps the oracle
    expressible) and the null-safe n_bytes column (null payloads decode
    as b'' with status='empty', so n_bytes must agree: 0, never null)."""
    media = batch[media_col]
    if isinstance(media, pa.ChunkedArray):
        media = media.combine_chunks()
    ids = [str(i) for i in batch[id_col].to_pylist()]
    payloads = [p or b"" for p in media.to_pylist()]
    hashes = [hashlib.md5(p.hex().encode("ascii")).hexdigest()
              for p in payloads]
    n_bytes = pc.coalesce(
        pc.cast(pc.binary_length(media), pa.int64()),
        pa.scalar(0, pa.int64()))
    return ids, payloads, hashes, n_bytes


AUDIO_FEATURES_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("n_bytes", pa.int64()),
    ("content_hash", pa.string()),
    ("sample_rate", pa.int32()),
    ("n_channels", pa.int32()),
    ("bits_per_sample", pa.int32()),
    ("n_samples", pa.int64()),
    ("duration_ms", pa.int64()),
    ("decode_status", pa.string()),
])


def parse_audio_header(payload: bytes) -> tuple[int, int, int, int, str]:
    """(sample_rate, n_channels, bits_per_sample, n_samples, status) from a
    REAL RIFF/WAVE chunk walk (no codec library): 'RIFF' + size + 'WAVE',
    then chunks of (fourcc, le32 size, body, odd-size pad byte) — the
    PCM 'fmt ' chunk yields rate/channels/bits, the 'data' chunk size
    divided by block_align yields the sample count.  Empty → ``empty``;
    non-RIFF magic → ``unsupported``; truncated headers, a missing
    fmt/data chunk or a zero block_align → ``corrupt``.
    """
    if not payload:
        return 0, 0, 0, 0, "empty"
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        if payload[:4] == b"RIFF":
            return 0, 0, 0, 0, "corrupt"
        return 0, 0, 0, 0, "unsupported"
    pos, n = 12, len(payload)
    rate = channels = bits = block_align = -1
    data_size = -1
    while pos + 8 <= n:
        fourcc = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if fourcc == b"fmt ":
            if len(body) < 16:
                return 0, 0, 0, 0, "corrupt"
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            block_align = int.from_bytes(body[12:14], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif fourcc == b"data":
            data_size = len(body)            # clamp a lying size to actual bytes
        pos += 8 + size + (size & 1)         # chunks are word-aligned
    if rate < 0 or data_size < 0 or block_align <= 0:
        return 0, 0, 0, 0, "corrupt"
    return rate, channels, bits, data_size // block_align, "ok"


def synth_audio_payload(sample_rate: int, n_channels: int,
                        bits_per_sample: int, body: bytes) -> bytes:
    """Deterministic well-formed PCM WAV with a REAL RIFF header (test
    corpus generator, mirrored hex-for-hex by the SQL oracle); ``body``
    is the raw data-chunk payload."""
    block_align = n_channels * bits_per_sample // 8
    byte_rate = sample_rate * block_align
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little")
           + n_channels.to_bytes(2, "little")
           + sample_rate.to_bytes(4, "little")
           + byte_rate.to_bytes(4, "little")
           + block_align.to_bytes(2, "little")
           + bits_per_sample.to_bytes(2, "little"))
    data = b"data" + len(body).to_bytes(4, "little") + body
    riff_size = 4 + len(fmt) + len(data)
    return b"RIFF" + riff_size.to_bytes(4, "little") + b"WAVE" + fmt + data


class AudioFeatureExtractor:
    """Actor-pool stage: binary WAV column → typed audio metadata columns
    (the audio sibling of :class:`MediaFeatureExtractor`; a real decoder
    or acoustic model would load in ``__init__``)."""

    def __init__(self, media_col: str = "media", id_col: str = "media_id") -> None:
        self.media_col = media_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, payloads, hashes, n_bytes = _media_batch_common(
            batch, self.media_col, self.id_col)
        rates, chans, bits_l, samples, durs, statuses = [], [], [], [], [], []
        for p in payloads:
            r, c, b, s, st = parse_audio_header(p)
            rates.append(r)
            chans.append(c)
            bits_l.append(b)
            samples.append(s)
            durs.append(s * 1000 // r if r > 0 else 0)
            statuses.append(st)
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "n_bytes": n_bytes,
            "content_hash": pa.array(hashes, pa.string()),
            "sample_rate": pa.array(rates, pa.int32()),
            "n_channels": pa.array(chans, pa.int32()),
            "bits_per_sample": pa.array(bits_l, pa.int32()),
            "n_samples": pa.array(samples, pa.int64()),
            "duration_ms": pa.array(durs, pa.int64()),
            "decode_status": pa.array(statuses, pa.string()),
        }, schema=AUDIO_FEATURES_SCHEMA)


def audio_features(ds, media_col: str = "media", id_col: str = "media_id",
                   batch_size: int = 32, concurrency=(2, 8)):
    """Dataset-level wrapper: small batches for large binary payloads."""
    return ds.map_batches(
        AudioFeatureExtractor,
        fn_constructor_args=(media_col, id_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# Video (MP4 / ISO-BMFF) — the video member of the multimodal family
# ---------------------------------------------------------------------------

VIDEO_FEATURES_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("n_bytes", pa.int64()),
    ("content_hash", pa.string()),
    ("timescale", pa.int32()),
    ("duration_ticks", pa.int64()),
    ("duration_ms", pa.int64()),
    ("n_tracks", pa.int32()),
    ("decode_status", pa.string()),
])


def parse_video_header(payload: bytes) -> tuple[int, int, int, str]:
    """(timescale, duration_ticks, n_tracks, status) from a REAL ISO
    base-media (MP4) box walk: top-level boxes are (be32 size, fourcc,
    body); an ``ftyp`` box must lead; inside ``moov``, ``mvhd`` v0
    carries timescale (be32 @12) and duration (be32 @16), and each
    ``trak`` child counts one track.  Empty → ``empty``; non-ftyp
    magic → ``unsupported``; truncated / malformed boxes or a missing
    moov/mvhd → ``corrupt``.
    """
    if not payload:
        return 0, 0, 0, "empty"
    if len(payload) < 8 or payload[4:8] != b"ftyp":
        return 0, 0, 0, "unsupported"
    n = len(payload)
    pos = 0
    timescale = duration = -1
    n_tracks = 0
    saw_moov = False
    while pos + 8 <= n:
        size = int.from_bytes(payload[pos:pos + 4], "big")
        fourcc = payload[pos + 4:pos + 8]
        if size < 8 or pos + size > n:
            return 0, 0, 0, "corrupt"
        if fourcc == b"moov":
            saw_moov = True
            inner, end = pos + 8, pos + size
            while inner + 8 <= end:
                isz = int.from_bytes(payload[inner:inner + 4], "big")
                ifc = payload[inner + 4:inner + 8]
                if isz < 8 or inner + isz > end:
                    return 0, 0, 0, "corrupt"
                if ifc == b"mvhd" and isz >= 8 + 20:
                    body = payload[inner + 8:inner + isz]
                    if body[0] == 0:          # version 0: 32-bit fields
                        timescale = int.from_bytes(body[12:16], "big")
                        duration = int.from_bytes(body[16:20], "big")
                elif ifc == b"trak":
                    n_tracks += 1
                inner += isz
        pos += size
    if not saw_moov or timescale <= 0 or duration < 0:
        return 0, 0, 0, "corrupt"
    return timescale, duration, n_tracks, "ok"


def synth_video_payload(timescale: int, duration_ticks: int, n_tracks: int,
                        body: bytes) -> bytes:
    """Deterministic well-formed minimal MP4 (ftyp + moov(mvhd v0 +
    empty traks) + mdat carrying ``body``), mirrored hex-for-hex by the
    SQL oracle."""
    ftyp = (16).to_bytes(4, "big") + b"ftypisom" + b"\x00\x00\x02\x00"
    mvhd_body = (b"\x00\x00\x00\x00"            # version+flags
                 + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
                 + timescale.to_bytes(4, "big")
                 + duration_ticks.to_bytes(4, "big"))
    mvhd = (8 + len(mvhd_body)).to_bytes(4, "big") + b"mvhd" + mvhd_body
    trak = (8).to_bytes(4, "big") + b"trak"
    moov_body = mvhd + trak * n_tracks
    moov = (8 + len(moov_body)).to_bytes(4, "big") + b"moov" + moov_body
    mdat = (8 + len(body)).to_bytes(4, "big") + b"mdat" + body
    return ftyp + moov + mdat


class VideoFeatureExtractor:
    """Actor-pool stage: binary MP4 column → typed video metadata columns
    (the video sibling of Media/AudioFeatureExtractor)."""

    def __init__(self, media_col: str = "media", id_col: str = "media_id") -> None:
        self.media_col = media_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, payloads, hashes, n_bytes = _media_batch_common(
            batch, self.media_col, self.id_col)
        scales, ticks, ms, tracks, statuses = [], [], [], [], []
        for p in payloads:
            ts, dur, tr, st = parse_video_header(p)
            scales.append(ts)
            ticks.append(dur)
            ms.append(dur * 1000 // ts if ts > 0 else 0)
            tracks.append(tr)
            statuses.append(st)
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "n_bytes": n_bytes,
            "content_hash": pa.array(hashes, pa.string()),
            "timescale": pa.array(scales, pa.int32()),
            "duration_ticks": pa.array(ticks, pa.int64()),
            "duration_ms": pa.array(ms, pa.int64()),
            "n_tracks": pa.array(tracks, pa.int32()),
            "decode_status": pa.array(statuses, pa.string()),
        }, schema=VIDEO_FEATURES_SCHEMA)


def video_features(ds, media_col: str = "media", id_col: str = "media_id",
                   batch_size: int = 32, concurrency=(2, 8)):
    """Dataset-level wrapper: small batches for large binary payloads."""
    return ds.map_batches(
        VideoFeatureExtractor,
        fn_constructor_args=(media_col, id_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
