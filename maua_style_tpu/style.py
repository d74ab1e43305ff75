"""CLI entry point for style transfer (reference: style.py:314-323).

Usage::

    python -m maua_style_tpu.style --content c.png --style s.png [...]

Dispatch is an explicit mapping, not the reference's ``eval()`` on user input
(style.py:323 — a deliberate divergence, see SURVEY.md §7 quirks).
"""

from __future__ import annotations

import numpy as np

from . import config


def main(argv=None) -> None:
    args = config.get_args(argv)

    if args.seed >= 0:
        np.random.seed(args.seed)

    from .pipelines.img_img import img_img

    dispatch = {"img_img": img_img}
    if args.transfer_type == "vid_img":
        from .pipelines.vid_img import vid_img

        dispatch["vid_img"] = vid_img
    elif args.transfer_type == "img_vid":
        from .pipelines.img_vid import img_vid

        dispatch["img_vid"] = img_vid

    dispatch[args.transfer_type](args)


if __name__ == "__main__":
    main()
