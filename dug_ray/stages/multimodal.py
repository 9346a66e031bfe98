"""Multimodal span handling: media columns as opaque refs + typed metadata.

The interleaved document table carries media spans (``kind='media'``,
``media_ref`` an opaque pointer — the stand-in for a binary payload
column). Codec libraries (PIL/librosa/av) are absent in this container,
so decode paths that need them are clearly-marked gates
(``NotImplementedError``) / deterministic fakes — EXCEPT the PPM (P6)
codec, which needs no library and is implemented for real
(``decode_ppm`` + ``nn_resize``; the ``media_decoded`` query pins the
decoded-and-resized payload bytes against a SQL oracle). All the
Ray-side plumbing — schema, actor signature, batch sizing, output
layout — is real and tested:

- ``media_metadata``: actor-pool ``map_batches`` stage that "probes" each
  media ref and emits typed metadata (kind, width, height) — the
  deterministic fake derives dimensions from the ref string, mirrored
  exactly by the SQL oracle;
- ``decode_media``: the real-decode entry point; raises NotImplementedError
  unless ``fake=True``, in which case it emits a deterministic byte
  payload of the probed size (small batches — binary payloads are why
  ``batch_size`` must stay low on this stage at real scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dug_ray.io import flatten_spans


def media_spans(docs: ray.data.Dataset) -> ray.data.Dataset:
    flat = flatten_spans(docs)
    return flat.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], "media"))
        .select(["doc_id", "offset", "media_ref"]),
        batch_format="pyarrow", batch_size=None)


class MediaProbe:
    """Actor-pool metadata prober (state: the codec registry — faked)."""

    def __init__(self):
        self.codecs = {"image": "fake-png", "audio": "fake-wav"}

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref")
        offs = pc.cast(batch["offset"], pa.int64())
        reflen = pc.cast(pc.utf8_length(refs), pa.int64())
        # deterministic fake probe (SQL-mirrorable): dimensions from the ref
        # string length; kind alternates by media ordinal ((offset-2)/3)
        ordinal = pc.divide(pc.subtract(offs, 2), 3)
        is_image = pc.equal(pc.bit_wise_and(ordinal, 1), 0)
        width = pc.add(64, pc.multiply(reflen, 7))
        height = pc.add(64, pc.multiply(reflen, 13))
        kind = pc.if_else(is_image, pa.scalar("image"), pa.scalar("audio"))
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "offset": offs,
            "media_ref": refs,
            "media_kind": kind,
            "width": width,
            "height": height,
        })


def media_metadata(docs: ray.data.Dataset, concurrency: int | tuple = (1, 4)) -> ray.data.Dataset:
    return media_spans(docs).map_batches(
        MediaProbe, batch_format="pyarrow", batch_size=None, concurrency=concurrency)


# ---------------------------------------------------------------------------
# PPM (P6) codec: the one REAL decode path this container can run.
# PPM needs no codec library — header is ASCII, pixels are raw RGB — so the
# decode/resize stages have a genuine non-stub branch. The synthetic object
# store behind the opaque media_ref pointers serves deterministic P6 images
# (pixel bytes are a linear function of a per-ref md5 seed), which makes
# the DECODED-AND-RESIZED payload itself SQL-mirrorable (see
# SQL_MEDIA_DECODED): the engine must round-trip header parse + raw-pixel
# extraction + nearest-neighbor resample to hit the oracle hash.
# ---------------------------------------------------------------------------

def synth_ppm(ref: str, width: int, height: int, seed: int) -> bytes:
    """Deterministic P6 image for an opaque ref — the storage-read stand-in
    (this sandbox has no backing object store). Byte j of the raster is
    ``(seed + 11*j) % 256``; the header is spec-conformant P6."""
    n = width * height * 3
    raster = ((seed + 11 * np.arange(n, dtype=np.int64)) % 256).astype(np.uint8)
    return f"P6\n{width} {height}\n255\n".encode() + raster.tobytes()


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL pure-Python P6 parser (works on any binary PPM, not just
    ``synth_ppm`` output): magic check, whitespace/#-comment tokenizer for
    width/height/maxval, then a zero-copy numpy view of the raster.
    Returns ``(width, height, uint8 array of shape (height, width, 3))``."""
    if payload[:2] != b"P6":
        raise ValueError(f"not a P6 PPM (magic {payload[:2]!r})")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":  # comment runs to end of line
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then the raster
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported (maxval {maxval})")
    n = width * height * 3
    raster = np.frombuffer(payload, np.uint8, count=n, offset=pos)
    return width, height, raster.reshape(height, width, 3)


def nn_resize(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample, integer-exact (source index =
    ``out_index * in_dim // out_dim`` — the floor-division contract the SQL
    oracle mirrors). Vectorized fancy-index; no interpolation."""
    h, w = img.shape[0], img.shape[1]
    ys = np.arange(out_h, dtype=np.int64) * h // out_h
    xs = np.arange(out_w, dtype=np.int64) * w // out_w
    return img[ys][:, xs]


def _ppm_seed(refs) -> np.ndarray:
    """Per-ref pixel seed: first 2 hex chars of md5(ref) (vectorized; SQL:
    ``CAST(('0x' || substr(md5(ref), 1, 2)) AS BIGINT)``)."""
    from dug_ray.hashing import md5_int
    return md5_int(np.asarray(refs, dtype=object)) >> 24


class MediaDecoder:
    """Actor-pool decode stage. ``codec='ppm'`` runs the REAL pure-Python
    P6 decode over the synthetic store (no codec library needed); other
    codecs are honestly gated (no image/audio libs in this container);
    ``fake=True`` emits deterministic byte payloads so the plumbing
    (binary column, small batches, actor pool) is exercised."""

    def __init__(self, fake: bool = False, codec: str | None = None):
        self.fake = fake
        self.codec = codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.codec == "ppm":
            # consumes MediaProbe output (media_kind/width/height columns —
            # decode_media routes through media_metadata): the probe is the
            # ONE owner of span geometry, never re-derived here
            batch = batch.filter(pc.equal(batch["media_kind"], "image"))
            refs = batch.column("media_ref").to_pylist()
            widths = pc.cast(batch["width"], pa.int64()).to_numpy(zero_copy_only=False)
            heights = pc.cast(batch["height"], pa.int64()).to_numpy(zero_copy_only=False)
            seeds = _ppm_seed(refs)
            payloads, dims = [], []
            for ref, w0, h0, s in zip(refs, widths, heights, seeds):
                w, h, img = decode_ppm(synth_ppm(ref, int(w0), int(h0), int(s)))
                payloads.append(img.tobytes())
                dims.append((w, h))
            return pa.table({
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "offset": pc.cast(batch["offset"], pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
                "width": pa.array([d[0] for d in dims], pa.int64()),
                "height": pa.array([d[1] for d in dims], pa.int64()),
            })
        if not self.fake:
            raise NotImplementedError(
                "media decode beyond PPM requires image/audio codecs not "
                "present in this environment; use codec='ppm' or fake=True")
        refs = batch.column("media_ref")
        reflen = pc.cast(pc.utf8_length(refs), pa.int64()).to_numpy(zero_copy_only=False)
        vals = ((reflen * 7)[:, None] + np.arange(64)[None, :]) % 256
        payloads = [row.tobytes() for row in vals.astype(np.uint8)]
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "offset": pc.cast(batch["offset"], pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        })


def decode_media(docs: ray.data.Dataset, fake: bool = False,
                 codec: str | None = None,
                 batch_size: int = 256, concurrency: int | tuple = (1, 4)) -> ray.data.Dataset:
    """Binary payloads need SMALL batches (batch x concurrency must fit the
    worker heap) — 256 here vs whole-block for scalar stages. A codec path
    runs probe -> decode (the decoder takes its geometry from MediaProbe's
    columns, never re-deriving it)."""
    src = media_metadata(docs) if codec else media_spans(docs)
    return src.map_batches(
        MediaDecoder, fn_constructor_kwargs={"fake": fake, "codec": codec},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


class MediaFeatures:
    """Actor-pool feature extractor — the batched-inference stage shape
    (model loaded once per actor in __init__, vectorized forward per
    batch). The real model is absent here, so the 'embedding' is a
    deterministic md5-derived 8-dim integer vector (hex digits of
    md5(media_ref)), which makes the full plumbing oracle-checkable."""

    DIM = 8

    def __init__(self, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "media feature extraction requires a vision/audio model not "
                "present in this environment; fake=True runs the "
                "deterministic md5 featurizer with the same plumbing")
        from dug_ray.hashing import md5_hex
        self._hash = md5_hex  # the 'model weights' slot (vectorized sidecar)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # vectorized: md5 via the DuckDB sidecar, hex digits decoded with
        # the simhash frombuffer trick (no per-row hashlib loop)
        hexes = self._hash(batch.column("media_ref"), self.DIM)
        b = np.frombuffer("".join(hexes).encode(), np.uint8).reshape(-1, self.DIM)
        digits = np.where(b >= ord("a"), b - ord("a") + 10,
                          b - ord("0")).astype(np.int64)
        cols = {
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "offset": pc.cast(batch["offset"], pa.int64()),
            "media_ref": batch["media_ref"],
        }
        for j in range(self.DIM):
            cols[f"f{j}"] = pa.array(digits[:, j], pa.int64())
        return pa.table(cols)


def media_features(docs: ray.data.Dataset, batch_size: int = 1024,
                   concurrency: int | tuple = (1, 4)) -> ray.data.Dataset:
    """Batched 'inference' over media spans (bounded batches — embedding
    output x concurrency must fit the worker heap at real dims)."""
    return media_spans(docs).map_batches(
        MediaFeatures, fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


def sample_frames(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Frame sampling: each media span yields 1 + (ordinal % 3) frames
    (flat_map shape: one input row -> n output rows, vectorized via repeat).
    Frame refs are derived pointers (ref#frame-i) — at real scale the
    decode stage resolves them against the container; here the expansion
    arithmetic and output layout are the real, oracle-checked parts."""

    def per_batch(batch: pa.Table) -> pa.Table:
        offs = pc.cast(batch["offset"], pa.int64()).to_numpy(zero_copy_only=False)
        ordinal = (offs - 2) // 3
        n_frames = 1 + (ordinal % 3)
        idx = np.repeat(np.arange(len(batch)), n_frames)
        frame_i = np.arange(n_frames.sum()) - np.repeat(
            np.concatenate([[0], np.cumsum(n_frames)[:-1]]), n_frames)
        refs_taken = pc.take(batch.column("media_ref"), pa.array(idx))
        if isinstance(refs_taken, pa.ChunkedArray):
            refs_taken = refs_taken.combine_chunks()
        frame_idx = pa.array(frame_i, pa.int64())
        return pa.table({
            "doc_id": pc.take(pc.cast(batch["doc_id"], pa.int64()), pa.array(idx)),
            "offset": pa.array(offs[idx], pa.int64()),
            "frame_idx": frame_idx,
            # vectorized ref#frame-i (no per-row f-string loop)
            "frame_ref": pc.binary_join_element_wise(
                refs_taken, pc.cast(frame_idx, pa.string()), "#frame-"),
        })

    return media_spans(docs).map_batches(per_batch, batch_format="pyarrow",
                                         batch_size=None)


class MediaResizer:
    """Actor-pool RESIZE stage (the remaining op of the brief's
    decode / feature-extract / resize / frame-sample family).
    ``codec='ppm'`` is the REAL branch: fetch the P6 container from the
    synthetic store, parse it with ``decode_ppm``, nearest-neighbor
    resample to (out_w, out_h), and emit the resized raw-RGB payload plus
    its md5 (over the lowercase hex encoding — the form a SQL oracle can
    rebuild byte for byte). Other codecs stay honestly gated;
    ``fake=True`` emits a deterministic payload so the plumbing — binary
    column, small batches, actor pool — is exercised without decoding.
    The target-DIMS arithmetic is pure integer (aspect-fit, floor
    division, never upscale) and lives in ``resize_dims``."""

    def __init__(self, fake: bool = False, codec: str | None = None):
        self.fake = fake
        self.codec = codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.codec == "ppm":
            import hashlib
            refs = batch.column("media_ref").to_pylist()
            w = pc.cast(batch["width"], pa.int64()).to_numpy(zero_copy_only=False)
            h = pc.cast(batch["height"], pa.int64()).to_numpy(zero_copy_only=False)
            ow = pc.cast(batch["out_w"], pa.int64()).to_numpy(zero_copy_only=False)
            oh = pc.cast(batch["out_h"], pa.int64()).to_numpy(zero_copy_only=False)
            seeds = _ppm_seed(refs)
            payloads, digests = [], []
            for i, ref in enumerate(refs):
                pw, ph, img = decode_ppm(
                    synth_ppm(ref, int(w[i]), int(h[i]), int(seeds[i])))
                raw = nn_resize(img, int(ow[i]), int(oh[i])).tobytes()
                payloads.append(raw)
                digests.append(hashlib.md5(raw.hex().encode()).hexdigest())
            return (batch.append_column("payload", pa.array(payloads, pa.binary()))
                         .append_column("n_bytes", pa.array(
                             [len(p) for p in payloads], pa.int64()))
                         .append_column("payload_md5", pa.array(digests, pa.string())))
        if not self.fake:
            raise NotImplementedError(
                "media resize beyond PPM requires image codecs not present in "
                "this environment; use codec='ppm' or fake=True")
        reflen = pc.cast(pc.utf8_length(batch["media_ref"]),
                         pa.int64()).to_numpy(zero_copy_only=False)
        ow = pc.cast(batch["out_w"], pa.int64()).to_numpy(zero_copy_only=False)
        oh = pc.cast(batch["out_h"], pa.int64()).to_numpy(zero_copy_only=False)
        vals = ((reflen * 31 + ow + oh)[:, None] + np.arange(32)[None, :]) % 256
        payloads = [row.tobytes() for row in vals.astype(np.uint8)]
        return batch.append_column("payload", pa.array(payloads, pa.binary()))


def resize_dims(meta: ray.data.Dataset, max_dim: int = 224) -> ray.data.Dataset:
    """Aspect-preserving fit-within-``max_dim`` target dimensions for image
    spans, integer-exact on both engines: out = dim * max_dim // max(w, h)
    when the larger side exceeds max_dim, unchanged otherwise (no
    upscaling). Output: doc_id, offset, media_ref, width, height, out_w,
    out_h, resized."""

    def dims(batch: pa.Table) -> pa.Table:
        img = batch.filter(pc.equal(batch["media_kind"], "image"))
        w = pc.cast(img["width"], pa.int64()).to_numpy(zero_copy_only=False)
        h = pc.cast(img["height"], pa.int64()).to_numpy(zero_copy_only=False)
        m = np.maximum(w, h)
        resized = m > max_dim
        out_w = np.where(resized, w * max_dim // np.maximum(m, 1), w)
        out_h = np.where(resized, h * max_dim // np.maximum(m, 1), h)
        return pa.table({
            "doc_id": pc.cast(img["doc_id"], pa.int64()),
            "offset": pc.cast(img["offset"], pa.int64()),
            "media_ref": img["media_ref"],
            "width": pa.array(w, pa.int64()),
            "height": pa.array(h, pa.int64()),
            "out_w": pa.array(out_w, pa.int64()),
            "out_h": pa.array(out_h, pa.int64()),
            "resized": pa.array(resized, pa.bool_()),
        })

    return meta.map_batches(dims, batch_format="pyarrow", batch_size=None)


def media_resize(docs: ray.data.Dataset, max_dim: int = 224, fake: bool = False,
                 codec: str | None = None, batch_size: int = 256,
                 concurrency: int | tuple = (1, 4)) -> ray.data.Dataset:
    """Full resize pipeline: probe -> image filter + integer target dims ->
    actor-pool resample (codec='ppm' is the real decode branch; small
    batches — binary payloads)."""
    return resize_dims(media_metadata(docs), max_dim).map_batches(
        MediaResizer, fn_constructor_kwargs={"fake": fake, "codec": codec},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)
