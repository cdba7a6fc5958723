"""Multimodal (image/audio/video) stages over opaque binary columns.

The engine treats media as ``binary`` payload columns + typed metadata
(w, h, fmt — the input_hint schema). Stages are actor-pool map_batches
classes: decoder state (codec tables / models) is built once per actor in
``__init__``, batches stay small because rows are wide (ray_guide.md
memory notes).

The three synthetic codecs (raw16/pngz/qnt in codecs.py) decode for REAL
here. Standard formats (jpeg/png via PIL) and audio/video sampling are
STUBBED behind import-try / NotImplementedError as the sandbox lacks the
libraries — the Ray-side plumbing (schema, actor signature, batch sizing,
output layout) is identical and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cocrawler_ray import codecs

try:  # real-image path, absent in this sandbox
    from PIL import Image  # noqa: F401
    HAS_PIL = True
except ImportError:
    HAS_PIL = False


class ImageDecodeStats:
    """Decode payloads -> per-channel mean/std + recomputed phash.

    Use: ds.map_batches(ImageDecodeStats, concurrency=N, batch_size=64,
    batch_format="pyarrow") — small batch_size because rows carry payloads.
    """

    def __init__(self):
        self.decode = codecs.decode  # codec dispatch bound once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        mean = np.zeros((n, 3)); std = np.zeros((n, 3))
        ph = np.zeros(n, dtype=np.int64)
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        for i in range(n):
            if fmts[i] in codecs.FORMATS:
                img = self.decode(data[i], int(ws[i]), int(hs[i]), fmts[i])
            elif HAS_PIL:
                raise NotImplementedError("PIL decode path: not exercised in sandbox")
            else:
                raise NotImplementedError(f"fmt {fmts[i]!r} needs PIL (not installed)")
            mean[i] = img.reshape(-1, 3).mean(axis=0)
            std[i] = img.reshape(-1, 3).std(axis=0)
            ph[i] = codecs.average_phash(img)
        out = batch.select(["image_id"])
        # raw float64 stats — rounding is a presentation concern left to
        # consumers (a pixel-sum mean is a dyadic rational, exact in f64)
        for c, name in enumerate("rgb"):
            out = out.append_column(f"mean_{name}", pa.array(mean[:, c]))
            out = out.append_column(f"std_{name}", pa.array(std[:, c]))
        return out.append_column("phash_decoded", pa.array(ph))


class ImageDims:
    """Decode payloads and report the DECODED pixel dimensions (not the
    metadata columns) — the trust-the-bytes half of keep-best dedup
    policies, where the cluster representative is chosen by actual
    decoded resolution."""

    def __init__(self):
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        n = batch.num_rows
        dw = np.zeros(n, dtype=np.int32)
        dh = np.zeros(n, dtype=np.int32)
        for i in range(n):
            img = self.decode(data[i], int(ws[i]), int(hs[i]), fmts[i])
            dh[i], dw[i] = img.shape[0], img.shape[1]
        return pa.table({"image_id": batch.column("image_id"),
                         "dec_w": pa.array(dw), "dec_h": pa.array(dh)})


class ImageResize:
    """Block-mean resize to (out_w, out_h), re-encoded as raw16."""

    def __init__(self, out_w: int = 8, out_h: int = 8):
        self.out_w, self.out_h = out_w, out_h

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        ys = (np.arange(self.out_h + 1) * h) // self.out_h
        xs = (np.arange(self.out_w + 1) * w) // self.out_w
        out = np.empty((self.out_h, self.out_w, 3), dtype=np.uint8)
        for i in range(self.out_h):
            for j in range(self.out_w):
                out[i, j] = img[ys[i]:max(ys[i + 1], ys[i] + 1),
                                xs[j]:max(xs[j + 1], xs[j] + 1)].mean(axis=(0, 1))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        resized = []
        for i in range(batch.num_rows):
            img = codecs.decode(data[i], int(ws[i]), int(hs[i]), fmts[i])
            resized.append(codecs.encode(self._resize(img), "raw16"))
        n = batch.num_rows
        return pa.table({
            "image_id": batch.column("image_id"),
            "bytes": pa.array(resized, pa.binary()),
            "w": pa.array(np.full(n, self.out_w, dtype=np.int32)),
            "h": pa.array(np.full(n, self.out_h, dtype=np.int32)),
            "fmt": pa.array(["raw16"] * n, pa.string()),
        })


class ImageDHash:
    """Decode payloads -> 64-bit difference-hash (gradient-direction
    perceptual hash; see codecs.difference_dhash). Complements the
    average-hash phash column: dhash survives brightness/contrast shifts
    that flip average-hash bits, so a near-dup pass can band on either."""

    def __init__(self):
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        dh = np.zeros(batch.num_rows, dtype=np.int64)
        for i in range(batch.num_rows):
            img = self.decode(data[i], int(ws[i]), int(hs[i]), fmts[i])
            dh[i] = codecs.difference_dhash(img)
        return pa.table({"image_id": batch.column("image_id"),
                         "dhash": pa.array(dh)})


class LossyRoundtripPSNR:
    """Quality gate for the input_hint's per-row invariant: decoded
    pixels must survive the lossy codec at PSNR >= threshold dB.

    Decodes each payload, round-trips it through the lossy ``qnt``
    codec, and emits the INTEGER sum of squared differences + sample
    count so the pass/fail bit is exact and SQL-restatable:
    psnr >= 40  <=>  mse <= 255^2/10^4  <=>  ssq * 10^4 <= 65025 * n.
    (Float psnr in dB is derivable downstream; the gate never computes a
    transcendental.) Lossless payloads round-trip onto the quantization
    lattice only once — already-qnt rows re-quantize exactly (ssq = 0).
    """

    def __init__(self, threshold_db: float = 40.0):
        # gate in integer space: ssq * scale <= max_mse_num * n
        # threshold 40dB -> mse <= 255^2 / 10^(40/10) = 65025/10^4
        if threshold_db != 40.0:
            raise ValueError("integer-exact gate is derived for 40 dB; "
                             "other thresholds need their own rational form")
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        n_rows = batch.num_rows
        ssq = np.zeros(n_rows, dtype=np.int64)
        npx = np.zeros(n_rows, dtype=np.int64)
        for i in range(n_rows):
            img = self.decode(data[i], int(ws[i]), int(hs[i]), fmts[i])
            rt = codecs.decode(codecs.encode(img, "qnt"),
                               int(ws[i]), int(hs[i]), "qnt")
            d = img.astype(np.int64) - rt.astype(np.int64)
            ssq[i] = int((d * d).sum())
            npx[i] = d.size
        passed = ssq * 10_000 <= 65_025 * npx
        return pa.table({"image_id": batch.column("image_id"),
                         "ssq": pa.array(ssq), "npx": pa.array(npx),
                         "passed": pa.array(passed)})


class ChannelStatsPartial:
    """Per-batch (channel, sum, sumsq, n) partials for the DATASET-level
    normalization-constant job (the "compute the corpus RGB mean/std once,
    bake into the training transform" pass). Each task decodes its batch
    and emits THREE rows of exact int64 moments — the driver (or a final
    reduce) combines O(tasks x 3) rows into mean/std per channel, so the
    decoded pixels never leave the worker and nothing scales with corpus
    size. Use: ds.map_batches(ChannelStatsPartial, concurrency=N,
    batch_size=64, batch_format="pyarrow")."""

    def __init__(self):
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        s = np.zeros(3, dtype=np.int64)
        ss = np.zeros(3, dtype=np.int64)
        n = 0
        for i in range(batch.num_rows):
            px = self.decode(data[i], int(ws[i]), int(hs[i]),
                             fmts[i]).reshape(-1, 3).astype(np.int64)
            s += px.sum(axis=0)
            ss += (px * px).sum(axis=0)
            n += px.shape[0]
        return pa.table({"ch": pa.array([0, 1, 2], pa.int64()),
                         "s": pa.array(s), "ss": pa.array(ss),
                         "n": pa.array(np.full(3, n, dtype=np.int64))})


class MaxBinGate:
    """Low-information (flat/synthetic) image gate: an image whose red-
    channel histogram concentrates >= 1/8 of its pixels in ONE bin is
    flagged flat — the integer-exact stand-in for entropy gating (the
    decision ``maxcnt * 8 >= npixels`` never computes a log, so every
    pass/fail bit is SQL-restatable). Real curation pipelines drop solid
    borders, blank thumbnails and single-color placeholders this way."""

    def __init__(self):
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        n_rows = batch.num_rows
        maxcnt = np.zeros(n_rows, dtype=np.int64)
        npx = np.zeros(n_rows, dtype=np.int64)
        for i in range(n_rows):
            img = self.decode(data[i], int(ws[i]), int(hs[i]), fmts[i])
            red = img[:, :, 0].ravel()
            maxcnt[i] = int(np.bincount(red, minlength=256).max())
            npx[i] = red.size
        return pa.table({"image_id": batch.column("image_id"),
                         "maxcnt": pa.array(maxcnt),
                         "flat": pa.array(maxcnt * 8 >= npx)})


class TileStats:
    """ViT-style patchify: split each decoded image into ``tile`` x
    ``tile`` pixel patches and emit one row per patch with its exact
    int64 pixel sum (all channels). Row expansion happens INSIDE the
    actor task (flat_map shape): a batch of B images becomes
    sum(w_i*h_i)/tile^2 patch rows, so patch tables inherit the input's
    partitioning and stream straight into per-patch transforms (token
    embedding, patch dedup) without a shuffle. Dims must be tile-aligned
    (the resize stage is the aligner upstream)."""

    def __init__(self, tile: int = 8):
        self.tile = tile
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.tile
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        ids = batch.column("image_id").to_pylist()
        out_id: list[str] = []
        out_ti: list[np.ndarray] = []
        out_tj: list[np.ndarray] = []
        out_sum: list[np.ndarray] = []
        for i in range(batch.num_rows):
            img = self.decode(data[i], int(ws[i]), int(hs[i]), fmts[i])
            h, w = img.shape[:2]
            if h % t or w % t:
                raise ValueError(f"{ids[i]}: {w}x{h} not {t}-aligned")
            sums = (img.astype(np.int64)
                    .reshape(h // t, t, w // t, t, 3)
                    .sum(axis=(1, 3, 4)))
            ti, tj = np.meshgrid(np.arange(h // t), np.arange(w // t),
                                 indexing="ij")
            out_id.extend([ids[i]] * sums.size)
            out_ti.append(ti.ravel().astype(np.int64))
            out_tj.append(tj.ravel().astype(np.int64))
            out_sum.append(sums.ravel())
        return pa.table({
            "image_id": pa.array(out_id, pa.string()),
            "ti": pa.array(np.concatenate(out_ti) if out_ti else
                           np.array([], np.int64)),
            "tj": pa.array(np.concatenate(out_tj) if out_tj else
                           np.array([], np.int64)),
            "tsum": pa.array(np.concatenate(out_sum) if out_sum else
                             np.array([], np.int64))})


class AudioFeatures:
    """Audio feature-extraction stub: real Ray plumbing, fake DSP.

    Emits fixed-size 'spectral' features as deterministic windowed byte
    statistics — replace ``_features`` with librosa/torchaudio outside the
    sandbox. State (window plan) built once per actor."""

    def __init__(self, n_windows: int = 8):
        self.n_windows = n_windows

    def _features(self, data: bytes) -> np.ndarray:
        if not data:
            return np.zeros(self.n_windows, dtype=np.float32)
        arr = np.frombuffer(data, dtype=np.uint8)
        pads = (-len(arr)) % self.n_windows
        if pads:
            arr = np.concatenate([arr, np.zeros(pads, dtype=np.uint8)])
        return arr.reshape(self.n_windows, -1).mean(axis=1).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(d) for d in batch.column("bytes").to_pylist()]
        return pa.table({
            "image_id": batch.column("image_id"),
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())),
        })


class HistEqualize:
    """Histogram equalization (contrast normalization before feature
    extraction): remap each red-channel value p to (cdf(p)*255)//npx —
    all integers, so the per-image sum of equalized pixels is exact and
    SQL-restatable. O(256) bincount/cumsum per decoded image."""

    def __init__(self):
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        n = batch.num_rows
        eq = np.zeros(n, dtype=np.int64)
        for i in range(n):
            img = self.decode(data[i], int(ws[i]), int(hs[i]), fmts[i])
            red = img[:, :, 0].ravel().astype(np.int64)
            cnt = np.bincount(red, minlength=256)
            remap = (np.cumsum(cnt) * 255) // red.size
            eq[i] = int(remap[red].sum())
        return pa.table({"image_id": batch.column("image_id"),
                         "eq_sum": pa.array(eq)})


class DominantColor:
    """Dominant-color extraction (the palette/thumbnail-color feature of
    an image index): vector-quantize each pixel to a 512-cube RGB
    lattice (r//32, g//32, b//32) and take the modal cube per image,
    ties to the smallest cube id — integer-exact argmax."""

    def __init__(self):
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        n = batch.num_rows
        cube = np.zeros(n, dtype=np.int64)
        cnt = np.zeros(n, dtype=np.int64)
        for i in range(n):
            img = self.decode(data[i], int(ws[i]), int(hs[i]),
                              fmts[i]).astype(np.int64)
            cubes = ((img[:, :, 0] // 32) * 64 + (img[:, :, 1] // 32) * 8
                     + (img[:, :, 2] // 32)).ravel()
            bc = np.bincount(cubes, minlength=512)
            cube[i] = int(bc.argmax())  # first max = smallest cube
            cnt[i] = int(bc[cube[i]])
        return pa.table({"image_id": batch.column("image_id"),
                         "cube": pa.array(cube), "cnt": pa.array(cnt)})


class BoxBlur:
    """3x3 box-filter total per image via a summed-area (integral)
    image: two cumsums + four clamped gathers give every box sum in O(1)
    per pixel — the standard constant-time window-sum technique. Exact
    int64 output (sum of all clamped 3x3 box sums over the red channel),
    verifiable against the closed-form per-pixel coverage count."""

    def __init__(self):
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        nb = batch.num_rows
        tot = np.zeros(nb, dtype=np.int64)
        for i in range(nb):
            img = self.decode(data[i], int(ws[i]), int(hs[i]), fmts[i])
            red = img[:, :, 0].astype(np.int64)
            h, w = red.shape
            ii = np.zeros((h + 1, w + 1), np.int64)
            ii[1:, 1:] = red.cumsum(0).cumsum(1)
            y0 = np.clip(np.arange(h) - 1, 0, None)
            y1 = np.clip(np.arange(h) + 1, None, h - 1)
            x0 = np.clip(np.arange(w) - 1, 0, None)
            x1 = np.clip(np.arange(w) + 1, None, w - 1)
            box = (ii[y1 + 1][:, x1 + 1] - ii[y0][:, x1 + 1]
                   - ii[y1 + 1][:, x0] + ii[y0][:, x0])
            tot[i] = int(box.sum())
        return pa.table({"image_id": batch.column("image_id"),
                         "box_total": pa.array(tot)})


class AudioZcr:
    """Signal-domain audio features with exact integer outputs: zero-
    crossing count (strict sign-product test — a DC-level sample neither
    makes nor breaks a crossing) and energy (sum of squared centered
    samples). Real DSP over the byte-stream view; swapping in a PCM
    decode (librosa/torchaudio, absent in this sandbox) changes only the
    sample extraction line. One batch pass, vectorized per payload."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch.column("bytes").to_pylist()
        n = batch.num_rows
        zcr = np.zeros(n, dtype=np.int64)
        energy = np.zeros(n, dtype=np.int64)
        for i, payload in enumerate(data):
            v = np.frombuffer(payload, dtype=np.uint8).astype(np.int64) \
                - 128
            if len(v) > 1:
                zcr[i] = int((v[:-1] * v[1:] < 0).sum())
            energy[i] = int((v * v).sum())
        return pa.table({"image_id": batch.column("image_id"),
                         "zcr": pa.array(zcr),
                         "energy": pa.array(energy)})


class FrameSample:
    """Video frame-sampling stub: real Ray plumbing, fake decoder.

    Emits every k-th 'frame' as a deterministic slice of the payload —
    replace `_frames` with a pyav/ffmpeg call outside the sandbox."""

    def __init__(self, every_k: int = 10):
        self.every_k = every_k

    def _frames(self, data: bytes) -> list[bytes]:
        if not data:
            return []
        step = max(1, len(data) // 16)
        chunks = [data[i:i + step] for i in range(0, len(data), step)]
        return chunks[:: self.every_k]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, idxs = [], [], []
        for i, data in enumerate(batch.column("bytes").to_pylist()):
            for j, fr in enumerate(self._frames(data)):
                ids.append(batch.column("image_id")[i].as_py())
                frames.append(fr)
                idxs.append(j)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "frame_idx": pa.array(np.array(idxs, dtype=np.int32)),
            "frame_bytes": pa.array(frames, pa.binary()),
        })


class CurateImageFeatures:
    """ONE decode per image feeding every curation gate: emits the
    qnt-roundtrip PSNR integers (ssq, npx), the flat-image histogram
    peak (maxcnt) and the 64-bit dhash in a single actor-pool pass.
    The composition rule at 100 TB: decode dominates, so gates that each
    re-decode (LossyRoundtripPSNR + MaxBinGate + ImageDHash as separate
    stages) pay 3x the dominant cost — a curation pipeline fuses the
    feature extraction and leaves filtering/dedup to cheap downstream
    column ops."""

    def __init__(self):
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        n = batch.num_rows
        ssq = np.zeros(n, dtype=np.int64)
        npx = np.zeros(n, dtype=np.int64)
        maxcnt = np.zeros(n, dtype=np.int64)
        dh = np.zeros(n, dtype=np.int64)
        for i in range(n):
            img = self.decode(data[i], int(ws[i]), int(hs[i]), fmts[i])
            rt = (img.astype(np.int64) // 8) * 8 + 4  # qnt lattice
            d = img.astype(np.int64) - rt
            ssq[i] = int((d * d).sum())
            npx[i] = d.size
            maxcnt[i] = int(np.bincount(img[:, :, 0].ravel(),
                                        minlength=256).max())
            dh[i] = codecs.difference_dhash(img)
        return pa.table({
            "image_id": batch.column("image_id"),
            "ssq": pa.array(ssq), "npx": pa.array(npx),
            "maxcnt": pa.array(maxcnt), "dhash": pa.array(dh)})


class SceneCut:
    """Shot-boundary (scene-cut) detection over raw-frame video payloads:
    per adjacent frame pair, the exact int64 sum of absolute pixel
    differences (SAD); a cut fires when ``sad >= threshold * w * h * 3``
    — integer-exact, so every cut bit is SQL-restatable. The real-video
    swap-in replaces the raw16 frame splitter with a pyav/ffmpeg decode
    in ``_frames`` (state built once per actor); the per-pair SAD kernel,
    row-expansion output (one row per frame pair, inside the task — no
    shuffle) and gate stay identical. Video curation uses the cut rows
    to pick one keyframe per shot instead of every k-th frame."""

    def __init__(self, threshold: int = 45):
        self.threshold = threshold

    def _frames(self, data: bytes, w: int, h: int) -> np.ndarray:
        fsz = w * h * 3
        n = len(data) // fsz
        return np.frombuffer(data[:n * fsz], dtype=np.uint8) \
            .reshape(n, h, w, 3)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("video_id").to_pylist()
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        out_id: list[str] = []
        out_fi: list[np.ndarray] = []
        out_sad: list[np.ndarray] = []
        out_cut: list[np.ndarray] = []
        for i in range(batch.num_rows):
            fr = self._frames(data[i], int(ws[i]), int(hs[i])) \
                .astype(np.int64)
            if len(fr) < 2:
                continue
            sad = np.abs(fr[1:] - fr[:-1]).sum(axis=(1, 2, 3))
            npx = int(ws[i]) * int(hs[i]) * 3
            out_id.extend([ids[i]] * len(sad))
            out_fi.append(np.arange(1, len(fr), dtype=np.int64))
            out_sad.append(sad)
            out_cut.append(sad >= self.threshold * npx)
        empty = np.array([], np.int64)
        return pa.table({
            "video_id": pa.array(out_id, pa.string()),
            "frame_idx": pa.array(np.concatenate(out_fi) if out_fi
                                  else empty),
            "sad": pa.array(np.concatenate(out_sad) if out_sad else empty),
            "cut": pa.array(np.concatenate(out_cut) if out_cut
                            else np.array([], bool))})


class ClipScoreGate:
    """Image-caption alignment scoring + gate — the LAION-style CLIP-score
    filter of an image-corpus build: embed both modalities, keep pairs
    whose cosine similarity clears a threshold.

    Sandbox stand-in for the model halves, with the Ray plumbing real:
    the image embedding is the decoded per-channel mean vector (real codec
    work per payload) and the caption embedding is a color-word
    bag-of-words count vector — both deterministic, so the DuckDB oracle
    can restate the full pipeline (pixel formula -> means -> cosine). At
    100 TB the two ``_embed`` methods swap for ONNX/torch encoders loaded
    once per actor in ``__init__``; batch sizing, actor signature, and the
    kept-rows-only output layout stay identical.

    Use: ds.map_batches(ClipScoreGate, concurrency=N, batch_size=64,
    batch_format="pyarrow") with fn_constructor_kwargs for the threshold.
    """

    _WORDS = ("red", "green", "blue")

    def __init__(self, threshold: float = 0.9):
        self.threshold = threshold
        self.decode = codecs.decode  # codec dispatch bound once per actor

    def _embed_image(self, img: np.ndarray) -> tuple[float, float, float]:
        m = img.reshape(-1, 3).mean(axis=0)
        return float(m[0]), float(m[1]), float(m[2])

    def _embed_caption(self, caption: str) -> tuple[float, float, float]:
        toks = caption.split()
        return tuple(float(sum(t == w for t in toks)) for w in self._WORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import math
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        caps = batch.column("caption").to_pylist()
        keep_idx, scores = [], []
        for i in range(batch.num_rows):
            img = self.decode(data[i], int(ws[i]), int(hs[i]), fmts[i])
            mr, mg, mb = self._embed_image(img)
            cr, cg, cb = self._embed_caption(caps[i])
            na = math.sqrt(mr * mr + mg * mg + mb * mb)
            nb = math.sqrt(cr * cr + cg * cg + cb * cb)
            if na == 0.0 or nb == 0.0:
                continue
            # same left-associated double arithmetic as the SQL mirror
            score = (mr * cr + mg * cg + mb * cb) / (na * nb)
            if score > self.threshold:
                keep_idx.append(i)
                scores.append(score)
        out = batch.select(["image_id", "caption"]).take(
            pa.array(keep_idx, pa.int64()))
        from cocrawler_ray.stages.text import round_half_away
        return out.append_column("clip_score", pa.array(
            round_half_away(np.asarray(scores, dtype=np.float64), 6)))


def _content_box(img, threshold: int):
    """Shared content-box scan for the letterbox measure/apply halves:
    (top, bottom, left, right) border widths of the signal box — a pixel
    with any channel >= threshold counts as signal. All-black frames
    return borders covering the whole image (h, 0, w, 0)."""
    sig = (img >= threshold).any(axis=2)
    rows = sig.any(axis=1)
    cols = sig.any(axis=0)
    if not rows.any():
        return img.shape[0], 0, img.shape[1], 0
    return (int(np.argmax(rows)), int(np.argmax(rows[::-1])),
            int(np.argmax(cols)), int(np.argmax(cols[::-1])))


class LetterboxDetect:
    """Black-border (letterbox / pillarbox) detection: decode, then find
    the first/last row and column carrying signal — a pixel with any
    channel >= ``threshold`` (8 by default: the qnt codec decodes a true
    0 to 4, so black bars survive every in-tree codec while the dimmest
    real content the fixtures emit is >= 16). Emits the four border
    widths plus the content-box size; an all-black image reports borders
    covering the full frame and a 0x0 box. The crop itself is a separate
    map (this stage is the measurement half, so the gate/crop policy can
    be decided from the stats without re-decoding)."""

    def __init__(self, threshold: int = 8):
        self.decode = codecs.decode
        self.threshold = int(threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        top = np.zeros(n, np.int64); bot = np.zeros(n, np.int64)
        lef = np.zeros(n, np.int64); rig = np.zeros(n, np.int64)
        for i in range(n):
            img = self.decode(data[i], int(ws[i]), int(hs[i]), fmts[i])
            top[i], bot[i], lef[i], rig[i] = _content_box(img,
                                                          self.threshold)
        inner_w = ws.astype(np.int64) - lef - rig
        inner_h = hs.astype(np.int64) - top - bot
        return pa.table({
            "image_id": batch.column("image_id"),
            "top_px": pa.array(top), "bot_px": pa.array(bot),
            "left_px": pa.array(lef), "right_px": pa.array(rig),
            "inner_w": pa.array(np.maximum(inner_w, 0)),
            "inner_h": pa.array(np.maximum(inner_h, 0))})


class TranscodeAudit:
    """Format-migration audit (the batch transcode pipeline's measure
    half): decode each payload, re-encode through the lossy ``qnt``
    codec, and report the REAL round-trip cost — encoded size and the
    integer sum of squared pixel error vs the decoded source. Exact
    integers (no PSNR float) so the decision gate ("migrate iff
    sse/npx under budget") is reproducible; already-quantized sources
    re-encode losslessly (sse 0), the idempotence a migration job
    relies on to be safely re-runnable."""

    def __init__(self):
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        enc_bytes = np.zeros(n, np.int64)
        sse = np.zeros(n, np.int64)
        for i in range(n):
            img = self.decode(data[i], int(ws[i]), int(hs[i]), fmts[i])
            enc, s = codecs.roundtrip_sse(img, "qnt")
            enc_bytes[i] = len(enc)
            sse[i] = s
        return pa.table({
            "image_id": batch.column("image_id"),
            "enc_bytes": pa.array(enc_bytes),
            "sse": pa.array(sse)})


class LetterboxCrop:
    """The APPLY half of letterbox handling: decode, find the content box
    (same signal scan as LetterboxDetect), crop to it, and report the
    cropped dimensions plus the integer sum of the cropped pixels — the
    checksum that proves the crop took exactly the content box without
    shipping pixels to the checker. An all-black frame crops to 0x0 with
    sum 0."""

    def __init__(self, threshold: int = 8):
        self.decode = codecs.decode
        self.threshold = int(threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        new_w = np.zeros(n, np.int64)
        new_h = np.zeros(n, np.int64)
        px_sum = np.zeros(n, np.int64)
        for i in range(n):
            img = self.decode(data[i], int(ws[i]), int(hs[i]), fmts[i])
            top, bot, lef, rig = _content_box(img, self.threshold)
            if top == int(hs[i]):  # all-black: 0x0 box, sum 0
                continue
            crop = img[top:int(hs[i]) - bot, lef:int(ws[i]) - rig, :]
            new_h[i], new_w[i] = crop.shape[0], crop.shape[1]
            px_sum[i] = int(crop.astype(np.int64).sum())
        return pa.table({
            "image_id": batch.column("image_id"),
            "new_w": pa.array(new_w), "new_h": pa.array(new_h),
            "px_sum": pa.array(px_sum)})


class SharpnessGate:
    """Blur detection by variance-of-Laplacian (the classic focus /
    sharpness measure used to gate blurry images out of training sets;
    reference analogue: the facet/quality gating family, SURVEY §2 M5/M6
    applied to the image axis). Decode -> channel-sum gray (int, 0..765)
    -> 4-neighbour Laplacian L = 4g - g_up - g_down - g_left - g_right
    over INTERIOR pixels -> exact integer variance in micro-units:
    var_micro = (n*ssq - s^2) * 10^6 // n^2 (Python-int arithmetic; the
    n*ssq*10^6 intermediate exceeds int64 for large frames, so the
    per-image reduction is done in unbounded ints). ``sharp`` is the
    integer-exact gate var_micro > threshold_micro — no float crosses
    the comparison, so engine and oracle agree bit-for-bit."""

    def __init__(self, threshold_micro: int = 776_000_000_000):
        self.decode = codecs.decode
        self.threshold_micro = int(threshold_micro)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        var_micro = np.zeros(n, np.int64)
        sharp = np.zeros(n, np.bool_)
        for i in range(n):
            img = self.decode(data[i], int(ws[i]), int(hs[i]),
                              fmts[i]).astype(np.int64)
            g = img.sum(axis=2)
            if g.shape[0] < 3 or g.shape[1] < 3:
                continue  # no interior: var 0, not sharp
            L = (4 * g[1:-1, 1:-1] - g[:-2, 1:-1] - g[2:, 1:-1]
                 - g[1:-1, :-2] - g[1:-1, 2:])
            m = int(L.size)
            s = int(L.sum())
            ss = int((L.astype(object) * L).sum())  # unbounded ints
            var_micro[i] = (m * ss - s * s) * 1_000_000 // (m * m)
            sharp[i] = var_micro[i] > self.threshold_micro
        return pa.table({
            "image_id": batch.column("image_id"),
            "var_micro": pa.array(var_micro),
            "sharp": pa.array(sharp)})


class SobelEdgeStats:
    """Edge-density census: decode -> gray (channel sum) -> 3x3 Sobel
    gx/gy over interior pixels -> integer magnitude |gx| + |gy| -> count
    of edge pixels over ``mag_threshold``. The gate ``dense_edges`` is
    the integer cross-multiplication 1000*edge_px > frac_permille*n_int
    (no float division). Edge density separates texture-rich content
    from flat/synthetic frames — a standard image-curation signal next
    to the sharpness and flatness gates."""

    def __init__(self, mag_threshold: int = 800, frac_permille: int = 570):
        self.decode = codecs.decode
        self.mag_threshold = int(mag_threshold)
        self.frac_permille = int(frac_permille)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        edge_px = np.zeros(n, np.int64)
        n_int = np.zeros(n, np.int64)
        dense = np.zeros(n, np.bool_)
        for i in range(n):
            img = self.decode(data[i], int(ws[i]), int(hs[i]),
                              fmts[i]).astype(np.int64)
            g = img.sum(axis=2)
            if g.shape[0] < 3 or g.shape[1] < 3:
                continue
            gx = ((g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:])
                  - (g[:-2, :-2] + 2 * g[1:-1, :-2] + g[2:, :-2]))
            gy = ((g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:])
                  - (g[:-2, :-2] + 2 * g[:-2, 1:-1] + g[:-2, 2:]))
            m = np.abs(gx) + np.abs(gy)
            edge_px[i] = int((m > self.mag_threshold).sum())
            n_int[i] = m.size
            dense[i] = 1000 * edge_px[i] > self.frac_permille * n_int[i]
        return pa.table({
            "image_id": batch.column("image_id"),
            "edge_px": pa.array(edge_px),
            "n_int": pa.array(n_int),
            "dense_edges": pa.array(dense)})


def _pos_checksum(a: np.ndarray) -> int:
    """Position-weighted integer checksum of an (h, w, 3) array:
    sum p(y, x, c) * (1 + x + y*w + c*w*h). Unlike a plain pixel sum it
    is NOT invariant under flips/rotations/crop-shifts, so it certifies
    the geometry of a transform, not just its pixel multiset."""
    h, w, c = a.shape
    wx = 1 + np.arange(w, dtype=np.int64)
    wy = w * np.arange(h, dtype=np.int64)
    wc = w * h * np.arange(c, dtype=np.int64)
    weights = wy[:, None, None] + wx[None, :, None] + wc[None, None, :]
    return int((a.astype(np.int64) * weights).sum())


class AugmentChecksum:
    """Deterministic geometric augmentation (horizontal flip + 90-degree
    clockwise rotation — the two cheap members of a training-time
    augmentation stack) with position-weighted integer checksums of each
    OUTPUT array. A plain pixel sum is flip-invariant and would pass a
    broken transform; the positional weights make any off-by-one or
    axis-swap in either transform change the checksum. Emits the rotated
    dims too (w/h swap) so downstream shard writers can re-bucket."""

    def __init__(self):
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        chk_flip = np.zeros(n, np.int64)
        chk_rot = np.zeros(n, np.int64)
        for i in range(n):
            img = self.decode(data[i], int(ws[i]), int(hs[i]), fmts[i])
            chk_flip[i] = _pos_checksum(img[:, ::-1, :])
            chk_rot[i] = _pos_checksum(np.rot90(img, k=-1))
        return pa.table({
            "image_id": batch.column("image_id"),
            "chk_flip": pa.array(chk_flip),
            "chk_rot": pa.array(chk_rot),
            "rot_w": pa.array(hs.astype(np.int64)),
            "rot_h": pa.array(ws.astype(np.int64))})


class MipPyramid:
    """Thumbnail / mip pyramid: decode -> ``levels`` successive 2x2
    box downsamples with FLOOR division (p1 = (4 pixels' sum) // 4 —
    exact integers, so the nested rounding is reproducible), each level
    emitted as a row with its dims and the position-weighted checksum
    of the level array (weights from _pos_checksum certify the
    downsample geometry, not just the pixel mass). One input row fans
    out to levels+1 output rows — the expansion shape shard writers
    consume when building multi-resolution training sets. Odd trailing
    rows/cols are dropped (floor halving), matching the oracle's
    x//2, y//2 grouping."""

    def __init__(self, levels: int = 2):
        self.decode = codecs.decode
        self.levels = int(levels)

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        ids_in = batch.column("image_id").to_pylist()
        ids, lvls, lws, lhs, chks = [], [], [], [], []
        for i in range(batch.num_rows):
            a = self.decode(data[i], int(ws[i]), int(hs[i]),
                            fmts[i]).astype(np.int64)
            for lv in range(self.levels + 1):
                if lv:
                    h2, w2 = a.shape[0] // 2, a.shape[1] // 2
                    a = (a[:2 * h2:2, :2 * w2:2] + a[1:2 * h2:2, :2 * w2:2]
                         + a[:2 * h2:2, 1:2 * w2:2]
                         + a[1:2 * h2:2, 1:2 * w2:2]) // 4
                ids.append(ids_in[i]); lvls.append(lv)
                lhs.append(a.shape[0]); lws.append(a.shape[1])
                chks.append(_pos_checksum(a))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "level": pa.array(np.array(lvls, np.int64)),
            "lw": pa.array(np.array(lws, np.int64)),
            "lh": pa.array(np.array(lhs, np.int64)),
            "chk": pa.array(np.array(chks, np.int64))})


class GammaLUT:
    """Point-op via a lookup table built once per actor (the canonical
    stateful-stage shape: 256-entry LUT in ``__init__``, vectorized
    np.take per batch). The transfer curve is gamma-0.5 in EXACT
    integers: p' = isqrt(255 * p) (floor square root — equals
    floor(255 * (p/255)^0.5) with no float in the loop), so engine and
    SQL oracle agree bit-for-bit. Emits per-image brightness-lift
    stats: sum of corrected pixels and the highlight census
    (corrected > 200)."""

    def __init__(self, highlight: int = 200):
        self.decode = codecs.decode
        self.highlight = int(highlight)
        p = np.arange(256, dtype=np.int64)
        self.lut = np.sqrt(255.0 * p).astype(np.int64)  # exact floor:
        # 255*p <= 65025 and double sqrt is exact on perfect squares,
        # >2e-3 from an integer otherwise — no misrounding possible

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        csum = np.zeros(n, np.int64)
        hi = np.zeros(n, np.int64)
        for i in range(n):
            img = self.decode(data[i], int(ws[i]), int(hs[i]), fmts[i])
            c = self.lut[img]
            csum[i] = int(c.sum())
            hi[i] = int((c > self.highlight).sum())
        return pa.table({
            "image_id": batch.column("image_id"),
            "gamma_sum": pa.array(csum),
            "highlight_px": pa.array(hi)})


class KeyframeSelect:
    """Per-SCENE keyframe selection — the video-curation composition of
    SceneCut and SharpnessGate: split the payload into raw frames,
    segment scenes by the same integer SAD gate as SceneCut
    (cut at frame fi when sad(fi, fi-1) >= threshold * w * h * 3;
    scene_id = running cut count, frame 0 opens scene 0), score every
    frame by the exact Laplacian micro-variance of SharpnessGate, and
    keep the sharpest frame per scene (tie -> earliest frame). One
    output row per scene: (video_id, scene_id, key_frame, var_micro,
    scene_len) — the manifest a training-shard writer consumes instead
    of every-k-th-frame sampling. All decisions are integer-exact, so
    the whole composition is SQL-restatable."""

    def __init__(self, threshold: int = 45):
        self.threshold = int(threshold)

    def _frames(self, data: bytes, w: int, h: int) -> np.ndarray:
        fsz = w * h * 3
        n = len(data) // fsz
        return np.frombuffer(data[:n * fsz], dtype=np.uint8) \
            .reshape(n, h, w, 3)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("video_id").to_pylist()
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        vids, scns, keys, vrs, lens = [], [], [], [], []
        for i in range(batch.num_rows):
            fr = self._frames(data[i], int(ws[i]), int(hs[i])) \
                .astype(np.int64)
            if not len(fr):
                continue
            npx = int(ws[i]) * int(hs[i]) * 3
            if len(fr) > 1:
                sad = np.abs(fr[1:] - fr[:-1]).sum(axis=(1, 2, 3))
                scene = np.concatenate(
                    [[0], np.cumsum(sad >= self.threshold * npx)])
            else:
                scene = np.zeros(1, np.int64)
            g = fr.sum(axis=3)
            if g.shape[1] < 3 or g.shape[2] < 3:
                var = np.zeros(len(fr), np.int64)
            else:
                L = (4 * g[:, 1:-1, 1:-1] - g[:, :-2, 1:-1]
                     - g[:, 2:, 1:-1] - g[:, 1:-1, :-2] - g[:, 1:-1, 2:])
                m = L.shape[1] * L.shape[2]
                s = L.sum(axis=(1, 2))
                ss = (L * L).sum(axis=(1, 2))
                # int64-safe for frame areas up to ~1 MPx (|L| <= 3060:
                # m*ss*1e6 < 2^63 needs m*ss < 9.2e12); larger frames
                # should switch this line to Python-int per-frame math
                var = (m * ss - s * s) * 1_000_000 // (m * m)
            for sc in range(int(scene[-1]) + 1):
                idx = np.flatnonzero(scene == sc)
                best = idx[np.argmax(var[idx])]  # argmax keeps first tie
                vids.append(ids[i]); scns.append(sc)
                keys.append(int(best)); vrs.append(int(var[best]))
                lens.append(len(idx))
        return pa.table({
            "video_id": pa.array(vids, pa.string()),
            "scene_id": pa.array(np.array(scns, np.int64)),
            "key_frame": pa.array(np.array(keys, np.int64)),
            "var_micro": pa.array(np.array(vrs, np.int64)),
            "scene_len": pa.array(np.array(lens, np.int64))})


class SilenceTrim:
    """Leading/trailing silence trim over audio payloads — the speech-
    curation analog of LetterboxDetect: a sample is SIGNAL when
    ``|s - 128| >= threshold`` (DC-centered byte view, same sample
    extraction as AudioZcr; a PCM decode swap changes only that line).
    Emits the front/tail silence lengths, the signal span length, and
    the exact integer energy of the TRIMMED span — the number a
    downstream loudness/duration gate consumes without re-reading the
    payload. All-silent payloads report (length, 0, 0, 0), mirroring
    the letterbox all-black convention."""

    def __init__(self, threshold: int = 8):
        self.threshold = int(threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch.column("bytes").to_pylist()
        n = batch.num_rows
        front = np.zeros(n, np.int64)
        tail = np.zeros(n, np.int64)
        sig_n = np.zeros(n, np.int64)
        energy = np.zeros(n, np.int64)
        for i, payload in enumerate(data):
            v = np.frombuffer(payload, dtype=np.uint8).astype(np.int64) \
                - 128
            sig = np.abs(v) >= self.threshold
            if not sig.any():
                front[i] = len(v)
                continue
            f = int(np.argmax(sig))
            t = int(np.argmax(sig[::-1]))
            front[i], tail[i] = f, t
            sig_n[i] = len(v) - f - t
            mid = v[f:len(v) - t]
            energy[i] = int((mid * mid).sum())
        return pa.table({
            "image_id": batch.column("image_id"),
            "front_n": pa.array(front), "tail_n": pa.array(tail),
            "signal_n": pa.array(sig_n),
            "signal_energy": pa.array(energy)})


class RleRuns:
    """Row-wise run-length census of the thresholded gray image: a run
    starts at each row's first pixel and at every foreground/background
    transition along x, so ``n_runs = h + transitions``. RLE run count
    is the classic compressibility probe for screenshot/synthetic
    detection — near-flat frames collapse to a few runs per row while
    photographic noise approaches one run per pixel. ``rle_saves`` is
    the integer gate 2*n_runs < n_px (a (value, length) pair per run
    beating one byte per pixel). Decode binds once per actor; the
    transition count is one vectorized compare over the whole frame."""

    def __init__(self, threshold: int = 380):
        self.decode = codecs.decode
        self.threshold = int(threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        n_runs = np.zeros(n, np.int64)
        n_px = np.zeros(n, np.int64)
        for i in range(n):
            img = self.decode(data[i], int(ws[i]), int(hs[i]),
                              fmts[i]).astype(np.int64)
            mask = img.sum(axis=2) > self.threshold
            n_runs[i] = mask.shape[0] + int(
                (mask[:, 1:] != mask[:, :-1]).sum())
            n_px[i] = mask.size
        return pa.table({
            "image_id": batch.column("image_id"),
            "n_runs": pa.array(n_runs), "n_px": pa.array(n_px),
            "rle_saves": pa.array(2 * n_runs < n_px)})


class BlobCount:
    """Connected-component census (4-connectivity) of the thresholded
    gray image — the blob-count segmentation signal (text/diagram frames
    fragment into many small components; photos yield few large ones).
    Labels start as each foreground pixel's linear index and iterate a
    vectorized 4-neighbour min-pool to fixpoint — the same label-
    propagation shape as the BSP graph components operator
    (stages/graph.py), here as per-image numpy shifts; iterations are
    bounded by the longest geodesic inside a component. Images with no
    foreground pixel emit no row (matching the oracle's GROUP BY over
    foreground pixels)."""

    def __init__(self, threshold: int = 640):
        self.decode = codecs.decode
        self.threshold = int(threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        ids, blobs, fgs = [], [], []
        for i in range(n):
            img = self.decode(data[i], int(ws[i]), int(hs[i]),
                              fmts[i]).astype(np.int64)
            mask = img.sum(axis=2) > self.threshold
            fg = int(mask.sum())
            if not fg:
                continue
            h, w = mask.shape
            big = h * w + 1
            cur = np.where(mask, np.arange(h * w).reshape(h, w), big)
            while True:
                nxt = cur.copy()
                nxt[1:, :] = np.minimum(nxt[1:, :], np.where(
                    mask[1:, :] & mask[:-1, :], cur[:-1, :], big))
                nxt[:-1, :] = np.minimum(nxt[:-1, :], np.where(
                    mask[:-1, :] & mask[1:, :], cur[1:, :], big))
                nxt[:, 1:] = np.minimum(nxt[:, 1:], np.where(
                    mask[:, 1:] & mask[:, :-1], cur[:, :-1], big))
                nxt[:, :-1] = np.minimum(nxt[:, :-1], np.where(
                    mask[:, :-1] & mask[:, 1:], cur[:, 1:], big))
                if np.array_equal(nxt, cur):
                    break
                cur = nxt
            ids.append(batch.column("image_id")[i].as_py())
            blobs.append(len(np.unique(cur[mask])))
            fgs.append(fg)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "n_blobs": pa.array(np.asarray(blobs, np.int64)),
            "n_fg": pa.array(np.asarray(fgs, np.int64))})


class HaarDetailEnergy:
    """Level-1 2D Haar wavelet detail energies over the gray frame —
    e_hh (diagonal), e_lh (horizontal), e_hl (vertical) as exact integer
    sums of squared 2x2 block details. The detail/approximation energy
    split is the classic texture-vs-flat probe (and the blur signal the
    sharpness gate reads differently); the LL half is the mip pyramid's
    first level, so together they complete the quad. Dims are
    8-divisible by the corpus contract, so the 2x2 tiling is exact."""

    def __init__(self):
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        e_hh = np.zeros(n, np.int64)
        e_lh = np.zeros(n, np.int64)
        e_hl = np.zeros(n, np.int64)
        for i in range(n):
            g = self.decode(data[i], int(ws[i]), int(hs[i]),
                            fmts[i]).astype(np.int64).sum(axis=2)
            a = g[0::2, 0::2]  # (y even, x even)
            b = g[0::2, 1::2]  # (y even, x odd)
            c = g[1::2, 0::2]  # (y odd, x even)
            d = g[1::2, 1::2]  # (y odd, x odd)
            hh = a - b - c + d
            lh = a + b - c - d
            hl = a - b + c - d
            e_hh[i] = int((hh * hh).sum())
            e_lh[i] = int((lh * lh).sum())
            e_hl[i] = int((hl * hl).sum())
        return pa.table({
            "image_id": batch.column("image_id"),
            "e_hh": pa.array(e_hh), "e_lh": pa.array(e_lh),
            "e_hl": pa.array(e_hl)})


class AudioDecimate:
    """2:1 decimation (every even sample) over raw audio payloads —
    the resample stage's integer skeleton. Emits the kept-sample count,
    the DC-centered energy of the kept half, and a position-weighted
    checksum so any off-by-one in the stride is caught."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        data = batch.column("bytes").to_pylist()
        n_out = np.zeros(n, np.int64)
        energy = np.zeros(n, np.int64)
        chk = np.zeros(n, np.int64)
        for i, payload in enumerate(data):
            v = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            kept = v[0::2]
            n_out[i] = len(kept)
            c = kept - 128
            energy[i] = int((c * c).sum())
            chk[i] = int((kept * (1 + np.arange(len(kept)))).sum())
        return pa.table({
            "image_id": batch.column("image_id"),
            "n_out": pa.array(n_out), "energy": pa.array(energy),
            "chk": pa.array(chk)})


class OrientationCensus:
    """HOG-lite gradient-orientation census: Sobel gx/gy over interior
    gray pixels, edge pixels (|gx|+|gy| > mag_threshold) bucketed by the
    sign quadrant b = 2*(gx>0) + (gy>0) — the 4-bin skeleton of the
    histogram-of-oriented-gradients descriptor (texture direction
    signature for near-dup and content-type detection), integer-exact
    end to end."""

    def __init__(self, mag_threshold: int = 800):
        self.decode = codecs.decode
        self.mag_threshold = int(mag_threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        b = np.zeros((n, 4), np.int64)
        for i in range(n):
            g = self.decode(data[i], int(ws[i]), int(hs[i]),
                            fmts[i]).astype(np.int64).sum(axis=2)
            if g.shape[0] < 3 or g.shape[1] < 3:
                continue
            gx = ((g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:])
                  - (g[:-2, :-2] + 2 * g[1:-1, :-2] + g[2:, :-2]))
            gy = ((g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:])
                  - (g[:-2, :-2] + 2 * g[:-2, 1:-1] + g[:-2, 2:]))
            edge = np.abs(gx) + np.abs(gy) > self.mag_threshold
            q = 2 * (gx > 0) + (gy > 0)
            for k in range(4):
                b[i, k] = int(((q == k) & edge).sum())
        return pa.table({
            "image_id": batch.column("image_id"),
            "b0": pa.array(b[:, 0]), "b1": pa.array(b[:, 1]),
            "b2": pa.array(b[:, 2]), "b3": pa.array(b[:, 3])})


class GrayscaleGate:
    """Near-monochrome detection (the LAION-style colorfulness gate):
    a pixel is 'colorful' when its largest inter-channel spread
    max(|r-g|, |g-b|, |r-b|) exceeds ``spread``; the image flags
    grayscalish when colorful pixels stay under ``permille``/1000 of the
    frame — integer cross-multiplication, no float. Screenshots, scans
    and dead camera sensors fail here long before any embedding model
    needs to look at them."""

    def __init__(self, spread: int = 24, permille: int = 50):
        self.decode = codecs.decode
        self.spread = int(spread)
        self.permille = int(permille)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        n_px = np.zeros(n, np.int64)
        n_colorful = np.zeros(n, np.int64)
        for i in range(n):
            img = self.decode(data[i], int(ws[i]), int(hs[i]),
                              fmts[i]).astype(np.int64)
            r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
            spread = np.maximum(np.abs(r - g),
                                np.maximum(np.abs(g - b), np.abs(r - b)))
            n_px[i] = spread.size
            n_colorful[i] = int((spread > self.spread).sum())
        return pa.table({
            "image_id": batch.column("image_id"),
            "n_px": pa.array(n_px), "n_colorful": pa.array(n_colorful),
            "grayscalish": pa.array(
                1000 * n_colorful < self.permille * n_px)})


class YCbCrSubsampleAudit:
    """JPEG-transcode chroma audit: fixed-point BT.601 RGB→YCbCr (the
    integer approximation every baseline JPEG pipeline uses —
    Y = (77R+150G+29B)>>8, Cb = ((-43R-85G+128B)>>8)+128,
    Cr = ((128R-107G-21B)>>8)+128, all floor shifts) plus a 4:2:0
    subsampling-loss census: a 2x2 block is 'busy' when either chroma
    plane's in-block range exceeds ``busy_range`` — exactly the blocks
    where 4:2:0 averaging visibly loses color detail. The number a bulk
    transcode pipeline reads before choosing 4:2:0 vs 4:4:4 per image.
    Integer-exact end to end (floor divisions restated verbatim in the
    SQL oracle); decode binds once per actor; per-image work is pure
    vectorized numpy (reshape-to-blocks min/max, no Python pixel
    loops). Requires even dimensions (the formula corpus is
    8-divisible)."""

    def __init__(self, busy_range: int = 16):
        self.decode = codecs.decode
        self.busy_range = int(busy_range)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        sum_y = np.zeros(n, np.int64)
        sum_cb = np.zeros(n, np.int64)
        sum_cr = np.zeros(n, np.int64)
        n_busy = np.zeros(n, np.int64)
        n_blocks = np.zeros(n, np.int64)
        for i in range(n):
            img = self.decode(data[i], int(ws[i]), int(hs[i]),
                              fmts[i]).astype(np.int64)
            r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
            # +32768 bias keeps the chroma dividends non-negative so
            # floor division == truncating division — DuckDB's // is
            # trunc-toward-zero, numpy's floor_divide floors; on
            # non-negative operands they agree, and
            # floor((t + 32768)/256) = floor(t/256) + 128 exactly
            yy = np.floor_divide(77 * r + 150 * g + 29 * b, 256)
            cb = np.floor_divide(-43 * r - 85 * g + 128 * b + 32768, 256)
            cr = np.floor_divide(128 * r - 107 * g - 21 * b + 32768, 256)
            sum_y[i] = int(yy.sum())
            sum_cb[i] = int(cb.sum())
            sum_cr[i] = int(cr.sum())
            h2, w2 = yy.shape[0] // 2, yy.shape[1] // 2
            busy = np.zeros((h2, w2), dtype=bool)
            for plane in (cb, cr):
                blk = plane[:h2 * 2, :w2 * 2].reshape(h2, 2, w2, 2)
                rng = blk.max(axis=(1, 3)) - blk.min(axis=(1, 3))
                busy |= rng > self.busy_range
            n_busy[i] = int(busy.sum())
            n_blocks[i] = h2 * w2
        return pa.table({
            "image_id": batch.column("image_id"),
            "sum_y": pa.array(sum_y), "sum_cb": pa.array(sum_cb),
            "sum_cr": pa.array(sum_cr), "n_busy": pa.array(n_busy),
            "n_blocks": pa.array(n_blocks)})


class OtsuThreshold:
    """Per-image Otsu binarization threshold over the 6-bit gray-sum
    histogram — the classic adaptive document/scan segmentation gate
    (screenshot and text frames show a strongly bimodal gray histogram;
    low-separability frames are flat or photographic). Gray = r+g+b is
    quantized to 64 bins (s3 // 12) so every between-class-variance
    comparison is EXACT integer arithmetic: for threshold t, the score
    is num/den with num = (cumS*N - S*cnt)^2 and den = cnt*(N - cnt)
    (num <= (765/12 * n_px * n_px)^2 fits int64 for n_px <= 1024; the
    argmax compares fractions by Python-int cross-multiplication, so no
    float ever orders two candidates). Constant frames (every den = 0)
    emit no row, matching the oracle's den > 0 filter. Decode binds
    once per actor; the histogram and cumulative sums are vectorized,
    and the argmax loop is O(bins), not O(pixels)."""

    BINS = 64

    def __init__(self, divisor: int = 12):
        self.decode = codecs.decode
        self.divisor = int(divisor)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        ids, t_out, fg, nums, dens = [], [], [], [], []
        bin_ids = np.arange(self.BINS, dtype=np.int64)
        for i in range(n):
            img = self.decode(data[i], int(ws[i]), int(hs[i]),
                              fmts[i]).astype(np.int64)
            bins = img.sum(axis=2) // self.divisor
            hist = np.bincount(bins.ravel(), minlength=self.BINS)
            N = np.int64(hist.sum())
            S = np.int64((hist * bin_ids).sum())
            cnt = np.cumsum(hist)[:-1]          # class0 size at t=0..62
            cums = np.cumsum(hist * bin_ids)[:-1]
            # Python-int (object dtype) arithmetic: (cums*N - S*cnt)^2
            # wraps int64 past ~7k pixels (ADVICE r4) — the bins axis is
            # only 63 wide, so exact bigint math here costs nothing and
            # the argmax stays exact for ANY image size.
            diff = cums.astype(object) * int(N) - int(S) * cnt.astype(object)
            num = diff * diff
            den = cnt.astype(object) * (int(N) - cnt.astype(object))
            best = -1
            bn = bd = 0
            for t in np.flatnonzero(den > 0):
                nt, dt = int(num[t]), int(den[t])
                if best < 0 or nt * bd > bn * dt:   # exact > compare
                    best, bn, bd = int(t), nt, dt
            if best < 0:
                continue
            if bn > (1 << 63) - 1:
                raise ValueError(
                    "sep_num exceeds int64 (image too large for the "
                    "exact-report contract, ~7k px); the argmax above "
                    "is still exact — widen the output schema to carry it")
            ids.append(batch.column("image_id")[i].as_py())
            t_out.append(best)
            fg.append(int(N) - int(cnt[best]))
            nums.append(bn)
            dens.append(bd)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "otsu_bin": pa.array(t_out, pa.int64()),
            "n_fg": pa.array(fg, pa.int64()),
            "sep_num": pa.array(nums, pa.int64()),
            "sep_den": pa.array(dens, pa.int64())})


class BlobBbox:
    """Largest-connected-component geometry of the thresholded gray
    frame — size and bounding box of the biggest 4-connected blob (ties
    break to the smallest component label). The region-proposal
    primitive next to BlobCount's census: a dominant compact blob says
    logo/diagram, a frame-spanning one says text page or border
    artifact. Same vectorized min-pool label propagation as BlobCount;
    the bbox is four argmin/argmax reductions over the winning mask.
    No-foreground frames emit no row."""

    def __init__(self, threshold: int = 640):
        self.decode = codecs.decode
        self.threshold = int(threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        data = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        ids, sz, x0s, x1s, y0s, y1s = [], [], [], [], [], []
        for i in range(n):
            img = self.decode(data[i], int(ws[i]), int(hs[i]),
                              fmts[i]).astype(np.int64)
            mask = img.sum(axis=2) > self.threshold
            if not mask.any():
                continue
            h, w = mask.shape
            big = h * w + 1
            cur = np.where(mask, np.arange(h * w).reshape(h, w), big)
            while True:
                nxt = cur.copy()
                nxt[1:, :] = np.minimum(nxt[1:, :], np.where(
                    mask[1:, :] & mask[:-1, :], cur[:-1, :], big))
                nxt[:-1, :] = np.minimum(nxt[:-1, :], np.where(
                    mask[:-1, :] & mask[1:, :], cur[1:, :], big))
                nxt[:, 1:] = np.minimum(nxt[:, 1:], np.where(
                    mask[:, 1:] & mask[:, :-1], cur[:, :-1], big))
                nxt[:, :-1] = np.minimum(nxt[:, :-1], np.where(
                    mask[:, :-1] & mask[:, 1:], cur[:, 1:], big))
                if np.array_equal(nxt, cur):
                    break
                cur = nxt
            labels, counts = np.unique(cur[mask], return_counts=True)
            best = labels[np.lexsort((labels, -counts))[0]]
            ym, xm = np.nonzero(cur == best)
            ids.append(batch.column("image_id")[i].as_py())
            sz.append(int(counts[labels == best][0]))
            x0s.append(int(xm.min())); x1s.append(int(xm.max()))
            y0s.append(int(ym.min())); y1s.append(int(ym.max()))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "blob_px": pa.array(sz, pa.int64()),
            "x0": pa.array(x0s, pa.int64()),
            "x1": pa.array(x1s, pa.int64()),
            "y0": pa.array(y0s, pa.int64()),
            "y1": pa.array(y1s, pa.int64())})


class AudioGain:
    """Peak-normalization audit over the byte-stream sample view: the
    centered peak amplitude, the integer permille gain that would bring
    it to the 127 full-scale target (floor division — never clips), and
    the DC offset sufficient statistics (sum, n — emitted raw so no
    negative integer division crosses an engine/SQL boundary). The
    loudness-leveling pre-step of every audio curation pipeline; a PCM
    decode swap-in changes only the sample extraction line."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch.column("bytes").to_pylist()
        n = batch.num_rows
        peak = np.zeros(n, dtype=np.int64)
        gain = np.zeros(n, dtype=np.int64)
        sum_dc = np.zeros(n, dtype=np.int64)
        nsamp = np.zeros(n, dtype=np.int64)
        for i, payload in enumerate(data):
            v = np.frombuffer(payload, dtype=np.uint8).astype(np.int64) \
                - 128
            p = int(np.abs(v).max()) if len(v) else 0
            peak[i] = p
            gain[i] = 127_000 // p if p else 0
            sum_dc[i] = int(v.sum())
            nsamp[i] = len(v)
        return pa.table({"image_id": batch.column("image_id"),
                         "peak": pa.array(peak),
                         "gain_permille": pa.array(gain),
                         "sum_dc": pa.array(sum_dc),
                         "n_samples": pa.array(nsamp)})
