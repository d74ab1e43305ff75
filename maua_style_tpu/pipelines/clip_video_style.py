"""CLIP-guided video styling (reference: clip_video_style.py): the vid_img
multi-pass/flow-warp loop (pipelines/frame_loop.py) with the CLIP+VQGAN
engine as the inner optimiser (optimize_cached reuses style/text targets
across frames; they re-encode per scale via update_styles, reference
clip_video_style.py:57-58).

The loop operates in the Caffe-BGR space (histogram matching + artifact
files), converting to [0, 1] RGB at the engine boundary — the reference
feeds BGR-mean-subtracted tensors straight into the VQGAN encoder
(clip_video_style.py:168-181), which clamps into a degenerate range; the
conversion here is the deliberate fix.  Like the reference, the flow
reliability mask is not fed to the optimiser (clip_video_style.py:164->173
computes then discards it).
"""

from __future__ import annotations

import numpy as np

from .. import io as mio
from ..io.image import CAFFE_MEAN
from ..utils import name
from .clip_vqgan import get_engine
from .flow_prepass import start_flow_prepass
from .frame_loop import run_video_style_passes


def _bgr_to_rgb01(x: np.ndarray) -> np.ndarray:
    return np.clip((x + CAFFE_MEAN)[..., ::-1] / 255.0, 0.0, 1.0)


def _rgb01_to_bgr(x: np.ndarray) -> np.ndarray:
    return x[..., ::-1] * 255.0 - CAFFE_MEAN


def clip_video_style(args) -> None:
    output_dir = args.output_dir + "/" + name(args.content) + "_" + "_".join(name(s) for s in args.style)

    frames, flow_ready = start_flow_prepass(args)
    style_images_big = mio.process_style_images(args)
    engine = get_engine(args.vqgan_dir, args.clip_backbone)

    def on_scale(current_size, style_images):
        engine.target_embeds = engine.update_styles(
            [_bgr_to_rgb01(s) for s in style_images], args.content_text, args.style_text
        )
        return engine

    def optimize_frame(eng, content_frame, pastiche, temporal_target, temporal_weights, num_iters):
        out01 = eng.optimize_cached(
            init=_bgr_to_rgb01(pastiche),
            content=_bgr_to_rgb01(content_frame),
            styles=None,
            mask=None,
            content_text=args.content_text,
            style_text=args.style_text,
            content_weight=args.content_weight,
            style_weight=args.style_weight,
            text_weight=getattr(args, "text_weight", 1.0),
            iterations=num_iters,
        )
        return _rgb01_to_bgr(out01)

    run_video_style_passes(
        args, output_dir, frames, style_images_big,
        on_scale=on_scale, optimize_frame=optimize_frame, use_temporal_targets=False,
        flow_ready=flow_ready,
    )


def main(argv=None):
    from .. import config

    args = config.get_args(argv)
    if args.seed >= 0:
        np.random.seed(args.seed)
    clip_video_style(args)


if __name__ == "__main__":
    main()
