"""Video stylisation with flow-warped temporal coherence — the Ruder et al.
multi-pass driver (reference: style.py:145-311).

Per scale: flow pre-pass artifacts feed per-frame warped temporal targets;
``passes_per_scale`` passes alternate frame direction; every frame resumes
from its PNG artifact ({output_dir}/{work}/{size}/{pass}_{frame}.png —
the reference's exact schema).  The feature net + jitted step compile once
per scale and are reused across every frame and pass; the (scale, pass,
frame) scheduling lives in pipelines/frame_loop.py, shared with the CLIP
video pipeline.
"""

from __future__ import annotations

from .. import io as mio
from ..utils import name
from .common import build_engine
from .flow_prepass import start_flow_prepass
from .frame_loop import run_video_style_passes


def vid_img(args) -> None:
    output_dir = args.output_dir + "/" + name(args.content) + "_" + "_".join(name(s) for s in args.style)

    # flow computes in the background while pass 1 optimises (the reference
    # serialises the whole pre-pass first, load.py:141-188); frame_loop joins
    # before the first pass that reads a flow artifact
    frames, flow_ready = start_flow_prepass(args)
    style_images_big = mio.process_style_images(args)

    def on_scale(current_size, style_images):
        return build_engine(args, current_size), style_images

    def optimize_frame(ctx, content_frame, pastiche, temporal_target, temporal_weights, num_iters):
        engine, style_images = ctx
        # temporal_target arrives as (prev_frame, warp_map); the engine warps
        # in-graph (frame_loop builds the pair, engine/optimize fuses it)
        return engine.optimize(
            content_frame,
            style_images,
            pastiche,
            num_iters,
            transfer_type="vid_img",
            blend_weights=args.style_blend_weights,
            temporal_warp=temporal_target,
            temporal_weights=temporal_weights,
        )

    run_video_style_passes(
        args, output_dir, frames, style_images_big,
        on_scale=on_scale, optimize_frame=optimize_frame, use_temporal_targets=True,
        # device-resident frame chain: the whole per-frame pipeline is one
        # jitted program and only uint8 images cross the host boundary
        frame_engine=lambda ctx: ctx[0],
        flow_ready=flow_ready,
    )


__all__ = ["vid_img"]
