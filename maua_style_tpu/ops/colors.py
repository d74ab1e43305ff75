"""Luminance-only style transfer helper (reference: load.py:234-240).

Keeps the content image's chroma (Cb/Cr) and takes luminance (Y) from the
stylised image.  Operates on PIL images at save time, exactly like the
reference — this is a host-side post-processing step, not part of the
compiled graph.
"""

from __future__ import annotations

from PIL import Image


def original_colors(content: Image.Image, generated: Image.Image) -> Image.Image:
    content_channels = list(content.resize(generated.size).convert("YCbCr").split())
    generated_channels = list(generated.convert("YCbCr").split())
    content_channels[0] = generated_channels[0]
    return Image.merge("YCbCr", content_channels).convert("RGB")


__all__ = ["original_colors"]
