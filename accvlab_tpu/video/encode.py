"""Test-asset video encoder (libavcodec via the native engine)."""

from __future__ import annotations

import ctypes
import numpy as np

from .native import get_lib, last_error


def write_video(
    path: str,
    frames_rgb: np.ndarray,
    fps: int = 12,
    gop_size: int = 30,
    codec: str = "libx264",
    options: str = "",
):
    """Encode ``(N, H, W, 3)`` uint8 RGB frames to a video file.

    Used to generate synthetic test clips (the reference commits
    pre-generated moving-shape clips under ``tests/data/`` instead;
    generating on demand keeps the repo binary-free).
    """
    frames = np.ascontiguousarray(np.asarray(frames_rgb, np.uint8))
    assert frames.ndim == 4 and frames.shape[-1] == 3, "expected (N, H, W, 3)"
    n, h, w, _ = frames.shape
    lib = get_lib()
    rc = lib.avx_encode_video2(
        path.encode(),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, w, h, fps, gop_size, codec.encode(), options.encode(),
    )
    if rc != 0:
        raise RuntimeError(f"encode failed (rc={rc}): {last_error()}")


def make_moving_shape_frames(
    n_frames: int = 90, hw=(96, 128), seed: int = 0
) -> np.ndarray:
    """Synthetic moving-rectangle frames with per-frame identifiable content
    (the frame index is encoded in the rectangle position, so decode tests
    can verify WHICH frame came back, like the reference's synthetic clips)."""
    h, w = hw
    frames = np.zeros((n_frames, h, w, 3), np.uint8)
    rng = np.random.default_rng(seed)
    color = rng.integers(64, 255, (3,), np.uint8)
    for i in range(n_frames):
        frames[i, :, :] = (16, 32, 48)
        x = (i * 7) % (w - 24)
        y = (i * 5) % (h - 24)
        frames[i, y : y + 20, x : x + 20] = color
        # intensity ramp encodes the frame index
        frames[i, :8, :8] = min(255, 20 + i * 2)
    return frames
