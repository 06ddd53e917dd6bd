"""Frame export: PNG / GIF / MP4 (PIL-based, gated)."""
from __future__ import annotations

import numpy as np


def save_png(path: str, frame: np.ndarray) -> None:
    from PIL import Image
    Image.fromarray(np.asarray(frame)).save(path)


def save_gif(path: str, frames, fps: int = 30) -> None:
    from PIL import Image
    if not frames:
        raise ValueError("no frames to save")
    imgs = [Image.fromarray(np.asarray(f)) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=max(1, int(1000 / fps)), loop=0)


def save_mp4(path: str, frames, fps: int = 30) -> None:
    try:
        import imageio.v2 as imageio
    except ImportError as e:  # pragma: no cover - optional dependency
        raise RuntimeError("mp4 export needs imageio; use save_gif") from e
    imageio.mimwrite(path, [np.asarray(f) for f in frames], fps=fps)
