"""Multimodal (image/audio/video) column stages.

Binary media ride as opaque `binary` columns with typed metadata. The
Ray-side plumbing — schema, actor-pool signature, small batch sizes for
wide binary payloads, deterministic output layout — is real and tested;
the actual media decoding is STUBBED (no image/audio libraries in this
container): `decode_stub=True` produces deterministic fake features,
`decode_stub=False` raises NotImplementedError at the exact point a real
decoder (PIL/torchaudio/ffmpeg) would plug in.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def binary_meta(batch: pa.Table, col: str, id_col: str) -> pa.Table:
    """Cheap metadata pass: payload size + emptiness, no decode."""
    data = batch.column(col)
    if not pa.types.is_binary(data.type) and not pa.types.is_large_binary(data.type):
        data = pc.cast(data, pa.large_binary())
    nbytes = pc.cast(pc.binary_length(data), pa.int64())
    return pa.table(
        {
            id_col: batch.column(id_col),
            "nbytes": nbytes,
            "non_empty": pc.greater(nbytes, 0),
        }
    )


class FrameSampler:
    """Actor-pool stage: sample N frames from a video/audio payload.

    Output is EXPLODED — one row per sampled frame: (id, frame_idx,
    frame_ts_ms, frame_bytes) — the layout a downstream per-frame
    feature extractor or dedup stage consumes. Container/codec parsing
    is STUBBED at the `_container_info` / `_extract_frame` seams
    (ffmpeg/pyav would plug in): the deterministic fake treats the
    payload as fixed-rate contiguous frame data, so the plumbing —
    explode layout, per-actor setup, small batches for wide binaries,
    deterministic timestamps — is real and tested."""

    def __init__(
        self, n_frames: int = 4, decode_stub: bool = True, frame_ms: int = 40
    ):
        self.n_frames = n_frames
        self.decode_stub = decode_stub
        self.frame_ms = frame_ms  # stub container: 25 fps

    def _container_info(self, payload: bytes) -> tuple[int, int]:
        """(n_total_frames, frame_nbytes) from the container header."""
        if not self.decode_stub:
            raise NotImplementedError(
                "container parsing requires ffmpeg/pyav; plug it in here"
            )
        frame_nbytes = max(1, min(4096, len(payload) // 16 or 1))
        return max(1, len(payload) // frame_nbytes), frame_nbytes

    def _extract_frame(self, payload: bytes, idx: int, frame_nbytes: int) -> bytes:
        if not self.decode_stub:
            raise NotImplementedError(
                "frame decode requires ffmpeg/pyav; plug it in here"
            )
        s = idx * frame_nbytes
        return payload[s : s + frame_nbytes]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        col = "payload" if "payload" in batch.columns else batch.columns[-1]
        id_col = next(c for c in batch.columns if c != col)
        ids, idxs, tss, frames = [], [], [], []
        for rid, payload in zip(batch[id_col], batch[col]):
            total, fb = self._container_info(payload)
            # evenly spaced sample, always including frame 0
            take = np.unique(
                np.linspace(0, total - 1, min(self.n_frames, total)).astype(int)
            )
            for i in take:
                ids.append(rid)
                idxs.append(int(i))
                tss.append(int(i) * self.frame_ms)
                frames.append(self._extract_frame(payload, int(i), fb))
        return pd.DataFrame(
            {
                id_col: pd.Series(ids, dtype=batch[id_col].dtype),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "frame_ts_ms": pd.Series(tss, dtype="int64"),
                "frame_bytes": pd.Series(frames, dtype=object),
            }
        )


class ImageResizer:
    """Actor-pool stage: decode image bytes -> resize -> re-encoded
    bytes + dimensions. Output keeps the payload OPAQUE binary plus
    typed metadata (src/dst width/height), the layout a training-data
    pipeline writes back to parquet. Decode/encode are STUBBED at the
    `_decode_image` / `_encode_image` seams (PIL/opencv would plug in):
    the deterministic fake treats the payload as a square uint8
    grayscale raster and resizes by numpy striding/averaging, so the
    plumbing — per-actor setup, small batches, metadata schema, exact
    target dims — is real and tested."""

    def __init__(
        self, target: int = 64, decode_stub: bool = True
    ):
        self.target = target
        self.decode_stub = decode_stub
        # a real implementation loads PIL/opencv here, once per actor

    def _decode_image(self, payload: bytes) -> np.ndarray:
        if not self.decode_stub:
            raise NotImplementedError(
                "image decode requires PIL/opencv; plug it in here"
            )
        side = max(1, int(len(payload) ** 0.5))
        arr = np.frombuffer(payload, dtype=np.uint8)[: side * side]
        if len(arr) < side * side:
            arr = np.pad(arr, (0, side * side - len(arr)))
        return arr.reshape(side, side)

    def _encode_image(self, img: np.ndarray) -> bytes:
        if not self.decode_stub:
            raise NotImplementedError(
                "image encode requires PIL/opencv; plug it in here"
            )
        return img.astype(np.uint8).tobytes()

    def _resize(self, img: np.ndarray) -> np.ndarray:
        t = self.target
        h, w = img.shape
        # nearest-neighbour index map — deterministic, no deps
        yi = np.minimum((np.arange(t) * h) // t, h - 1)
        xi = np.minimum((np.arange(t) * w) // t, w - 1)
        return img[yi][:, xi]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        col = "payload" if "payload" in batch.columns else batch.columns[-1]
        id_col = next(c for c in batch.columns if c != col)
        src_w, src_h, out_bytes = [], [], []
        for payload in batch[col]:
            img = self._decode_image(payload)
            src_h.append(img.shape[0])
            src_w.append(img.shape[1])
            out_bytes.append(self._encode_image(self._resize(img)))
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "payload": pd.Series(out_bytes, dtype=object),
                "src_height": pd.Series(src_h, dtype="int64"),
                "src_width": pd.Series(src_w, dtype="int64"),
                "height": pd.Series([self.target] * len(batch), dtype="int64"),
                "width": pd.Series([self.target] * len(batch), dtype="int64"),
            }
        )


class RawVideoFrameSampler:
    """Actor-pool stage with NO stubbed seam: samples frames from RAW
    video payloads — n_frames x (H*W*C) uint8 rasters concatenated,
    with the layout in explicit columns (n_frames/height/width/
    channels/fps). Frame extraction is exact byte slicing, timestamps
    come from fps; evenly spaced sample always including frame 0.
    Output explodes to one row per sampled frame in the SAME raw-raster
    layout RawRasterResizer consumes, so sample -> resize chains with
    no decoder anywhere. Container FORMATS (mp4 etc.) still go through
    FrameSampler's ffmpeg seam."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = int(n_frames)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, tss, frames, hs, ws, cs = [], [], [], [], [], [], []
        for row in batch.itertuples(index=False):
            fb = int(row.height) * int(row.width) * int(row.channels)
            total = int(row.n_frames)
            if len(row.payload) != total * fb:
                raise ValueError(
                    f"raw video payload is {len(row.payload)} B, expected "
                    f"{total} frames x {fb} B"
                )
            take = np.unique(
                np.linspace(0, total - 1, min(self.n_frames, total)).astype(int)
            )
            for i in take:
                ids.append(row.media_id)
                idxs.append(int(i))
                tss.append(int(round(i * 1000.0 / float(row.fps))))
                frames.append(row.payload[i * fb : (i + 1) * fb])
                hs.append(int(row.height))
                ws.append(int(row.width))
                cs.append(int(row.channels))
        return pd.DataFrame(
            {
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "frame_ts_ms": pd.Series(tss, dtype="int64"),
                "payload": pd.Series(frames, dtype=object),
                "height": pd.Series(hs, dtype="int64"),
                "width": pd.Series(ws, dtype="int64"),
                "channels": pd.Series(cs, dtype="int64"),
            }
        )


class RawRasterResizer:
    """Actor-pool stage with NO stubbed seam: resizes RAW uint8 rasters
    (payload = H*W*C bytes, dimensions in explicit height/width/channels
    columns — the layout a decode stage upstream of this one emits, and
    the one training pipelines store after decoding once). Vectorized
    bilinear interpolation (pixel-center convention, float32 accumulate,
    round-half-up to uint8); only COMPRESSED formats need the PIL seam
    in ImageResizer. Use with small batch_size — rasters are wide rows."""

    def __init__(self, target_h: int = 64, target_w: int = 64):
        self.th, self.tw = int(target_h), int(target_w)
        # precompute nothing global: source dims vary per row; the
        # per-row index maps below are O(target) numpy ops

    def _bilinear(self, img: np.ndarray) -> np.ndarray:
        h, w, c = img.shape
        th, tw = self.th, self.tw
        fy = np.clip((np.arange(th) + 0.5) * h / th - 0.5, 0, h - 1)
        fx = np.clip((np.arange(tw) + 0.5) * w / tw - 0.5, 0, w - 1)
        y0 = np.floor(fy).astype(np.int64)
        x0 = np.floor(fx).astype(np.int64)
        y1 = np.minimum(y0 + 1, h - 1)
        x1 = np.minimum(x0 + 1, w - 1)
        wy = (fy - y0).astype(np.float32)[:, None, None]
        wx = (fx - x0).astype(np.float32)[None, :, None]
        im = img.astype(np.float32)
        top = im[y0][:, x0] * (1 - wx) + im[y0][:, x1] * wx
        bot = im[y1][:, x0] * (1 - wx) + im[y1][:, x1] * wx
        out = top * (1 - wy) + bot * wy
        return np.floor(out + 0.5).astype(np.uint8)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for payload, h, w, c in zip(
            batch["payload"], batch["height"], batch["width"], batch["channels"]
        ):
            img = np.frombuffer(payload, dtype=np.uint8).reshape(
                int(h), int(w), int(c)
            )
            outs.append(self._bilinear(img).tobytes())
        # pass through identity columns (media_id, frame_idx, ...) so the
        # stage composes with RawVideoFrameSampler without losing lineage
        passthrough = [
            c for c in batch.columns if c not in ("payload", "height", "width", "channels")
        ]
        out = pd.DataFrame({c: batch[c].to_numpy() for c in passthrough})
        out["payload"] = pd.Series(outs, dtype=object)
        out["height"] = pd.Series([self.th] * len(batch), dtype="int64")
        out["width"] = pd.Series([self.tw] * len(batch), dtype="int64")
        out["channels"] = batch["channels"].astype("int64").to_numpy()
        return out


class MediaFeatureExtractor:
    """Actor-pool stage: decode media bytes -> fixed-size feature vector.

    __init__ loads the (stubbed) model once per actor; __call__ handles a
    small batch (wide binary rows -> keep batch_size low, e.g. 64)."""

    FEATURE_DIM = 8

    def __init__(self, decode_stub: bool = True, seed: int = 3):
        self.decode_stub = decode_stub
        self.seed = seed
        # a real implementation would load the decoder/model here, once
        # per actor (e.g. PIL, torchaudio, an ONNX session)

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.decode_stub:
            raise NotImplementedError(
                "media decoding requires an image/audio library not present "
                "in this environment; plug PIL/ffmpeg/torchaudio in here"
            )
        # deterministic fake decode: byte-histogram moments as 'features'
        arr = np.frombuffer(payload, dtype=np.uint8)
        if len(arr) == 0:
            return np.zeros(self.FEATURE_DIM)
        hist = np.bincount(arr >> 5, minlength=self.FEATURE_DIM).astype(np.float64)
        return np.round(hist / hist.sum(), 6)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        col = "payload" if "payload" in batch.columns else batch.columns[-1]
        feats = np.stack([self._decode(p) for p in batch[col]])
        out = pd.DataFrame({c: batch[c] for c in batch.columns if c != col})
        out["features"] = list(feats)
        return out


class RawAudioFeaturizer:
    """Actor-pool stage with NO stubbed seam: windowed features over
    RAW PCM16-LE audio (payload = interleaved-free mono samples,
    sample_rate in its own column — the layout a decode stage upstream
    emits). Per window of `window` samples: RMS energy and
    zero-crossing rate, both quantized to integer millis
    (floor(x * 1000 + 0.5)) so results are bit-stable across platforms.
    Emits one row per window with its start time; the trailing partial
    window is dropped (documented — matches fixed-frame featurizers).
    Only COMPRESSED audio (mp3/ogg/flac) needs a codec seam; PCM needs
    none, completing the image/video/audio no-stub triad."""

    def __init__(self, window: int = 256):
        if window < 2:
            raise ValueError("window must be >= 2")
        self.window = int(window)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, widx, t0s, rms_m, zcr_m = [], [], [], [], []
        w = self.window
        for mid, payload, sr in zip(
            batch["media_id"], batch["payload"], batch["sample_rate"]
        ):
            s = np.frombuffer(payload, dtype="<i2").astype(np.float64)
            n_win = len(s) // w
            if n_win == 0:
                continue
            x = s[: n_win * w].reshape(n_win, w)
            # RMS normalized to [0, 1] against the int16 full scale
            rms = np.sqrt(np.mean(x * x, axis=1)) / 32768.0
            # sign changes per window / (window - 1); zeros count as
            # positive so silence is 0 crossings, deterministically
            sgn = np.where(x >= 0, 1, -1)
            zcr = (sgn[:, 1:] != sgn[:, :-1]).sum(axis=1) / (w - 1)
            ids.extend([mid] * n_win)
            widx.extend(range(n_win))
            t0s.extend(
                (np.arange(n_win, dtype=np.float64) * w / float(sr)).tolist()
            )
            rms_m.extend(np.floor(rms * 1000 + 0.5).astype(np.int64).tolist())
            zcr_m.extend(np.floor(zcr * 1000 + 0.5).astype(np.int64).tolist())
        return pd.DataFrame(
            {
                "media_id": pd.array(ids, dtype="int64"),
                "window_idx": pd.array(widx, dtype="int64"),
                "t0_sec": pd.array(t0s, dtype="float64"),
                "rms_milli": pd.array(rms_m, dtype="int64"),
                "zcr_milli": pd.array(zcr_m, dtype="int64"),
            }
        )
