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
