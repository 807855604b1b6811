"""Image utilities (reference utils.py:12-105): strips, grids, I/O."""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
from PIL import Image


def to_pil(images: np.ndarray) -> List[Image.Image]:
    """(N, H, W, 3) uint8 or [0,1] float -> list of PIL images."""
    x = np.asarray(images)
    if x.dtype != np.uint8:
        x = (np.clip(x, 0.0, 1.0) * 255).round().astype(np.uint8)
    return [Image.fromarray(im) for im in x]


def show_images_horizontally(
    images, output_file: Optional[str] = None, interact: bool = False, upscale: int = 1
):
    """Horizontal strip of an image sequence; saves PNG if output_file given
    (reference utils.py:12-45, without the matplotlib dependency)."""
    pil = to_pil(np.asarray(images)) if not isinstance(images[0], Image.Image) else list(images)
    if upscale != 1:
        pil = [im.resize((im.width * upscale, im.height * upscale), Image.NEAREST) for im in pil]
    w, h = pil[0].size
    strip = Image.new("RGB", (w * len(pil), h))
    for i, im in enumerate(pil):
        strip.paste(im, (i * w, 0))
    if output_file:
        strip.save(output_file)
    if interact:
        try:
            from IPython.display import display

            display(strip)
        except ImportError:
            pass
    return strip


def image_grids(images, rows: Optional[int] = None, cols: Optional[int] = None) -> Image.Image:
    """Paste images into a grid (reference utils.py:48-68)."""
    if images is None or len(images) == 0:
        raise ValueError("The image list is empty.")
    pil = to_pil(np.asarray(images)) if not isinstance(images[0], Image.Image) else list(images)
    n = len(pil)
    if cols is None:
        cols = int(n ** 0.5)
    if rows is None:
        rows = (n + cols - 1) // cols
    w, h = pil[0].size
    grid = Image.new("RGB", (cols * w, rows * h))
    for i, im in enumerate(pil):
        r, c = divmod(i, cols)
        grid.paste(im, (c * w, r * h))
    return grid


def save_image(image: np.ndarray, file_name: str) -> None:
    """Save one (H, W, 3) image (reference utils.py:71-80)."""
    Image.fromarray(np.asarray(image)).save(file_name)


def load_and_process_images(load_dir: str) -> List[np.ndarray]:
    """Load .jpg images sorted numerically, scaled to [0, 1]
    (reference utils.py:83-105)."""
    images = []
    names = sorted(
        (f for f in os.listdir(load_dir) if f.endswith(".jpg")),
        key=lambda x: int(x.split(".")[0]),
    )
    for name in names:
        img = Image.open(os.path.join(load_dir, name))
        images.append(np.asarray(img) / 255.0)
    return images
