"""Shared multi-pass video frame scheduler (reference: style.py:145-311 and
clip_video_style.py:35-197, which duplicate the same loop around different
inner optimisers).

Handles: per-scale skip when the next scale is complete, per-pass skip,
optional loop rotation, alternating frame direction, per-frame artifact
resume, pastiche initialisation (random / prev_warp / content / previous
pass/scale artifacts), flow-warped temporal targets + blending, saving, and
muxing.  The per-scale setup and the inner optimisation are injected.

Two inner paths:

- **device chain** (vid_img with a StyleEngine): the whole per-frame
  pipeline — u8 preprocess, histogram match, init/blend, flow warp,
  optimisation, output match, u8 deprocess — is ONE jitted device program
  (engine.optimize_frame); the pastiche stays device-resident between
  frames and PNG artifacts are written by a background thread.  Per frame
  only a uint8 image goes up and a uint8 image comes down (the reference
  round-trips ~6 float32 arrays through the host per frame,
  style.py:192-297).
- **host path** (CLIP video, --original_colors): the original per-frame
  host orchestration.
"""

from __future__ import annotations

import glob
import os
import random
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .. import io as mio
from ..io.flo import flow_warp_map, read_flo, reliable_flow_weighting
from ..ops.histogram import match_histogram
from ..ops.resize import resize_bilinear_np, scale_shape
from ..utils import name
from .vid_img_mux import mux_video, warp


class _AsyncSaver:
    """Fetches device u8 images and writes PNGs off the critical path."""

    def __init__(self):
        self._pool = ThreadPoolExecutor(max_workers=2)
        self._futures = []

    def submit(self, display_u8, out_path: str) -> None:
        from PIL import Image

        def write():
            Image.fromarray(np.asarray(display_u8)).save(out_path)

        self._futures.append(self._pool.submit(write))

    def drain(self) -> None:
        for f in self._futures:
            f.result()  # surface write errors
        self._futures.clear()

    def close(self) -> None:
        self.drain()
        self._pool.shutdown()


def run_video_style_passes(
    args,
    output_dir: str,
    frames: list[str],
    style_images_big: list[np.ndarray],
    *,
    on_scale,
    optimize_frame,
    use_temporal_targets: bool,
    frame_engine=None,
    flow_ready=None,
) -> None:
    """Drive the (scale, pass, frame) triple loop.

    on_scale(current_size, style_images) -> scale context for optimize_frame.
    optimize_frame(ctx, content_frame, pastiche, temporal_target,
    temporal_weights, num_iters) -> stylised frame (Caffe-BGR NHWC).
    ``use_temporal_targets``: vid_img feeds the flow-warped previous frame as
    a weighted temporal target; the CLIP pipeline does not (the reference
    computes but discards it, clip_video_style.py:164->173).
    ``frame_engine(ctx)``: returns the StyleEngine for the fused device-chain
    path, or None to use the host path.
    ``flow_ready``: join handle of an overlapped flow pre-pass
    (flow_prepass.start_flow_prepass) — called before the first pass that
    reads flow artifacts, so pass 1 optimisation overlaps flow computation.
    """
    from .common import scale_styles

    content_size = mio.preprocess(frames[0]).shape[1:3]
    saver = _AsyncSaver()

    try:
        prev_size = args.image_sizes[0]
        for size_n, (current_size, num_iters) in enumerate(zip(args.image_sizes, args.num_iters)):
            next_size = args.image_sizes[min(len(args.image_sizes) - 1, size_n + 1)]
            if len(glob.glob(f"{output_dir}/{next_size}/*.png")) == len(frames):
                print(f"Skipping size: {current_size}, already done.")
                prev_size = current_size
                continue

            print(f"\nCurrent size {current_size}px")
            os.makedirs(f"{output_dir}/{current_size}", exist_ok=True)
            content_scale = current_size / max(*content_size)

            style_images = scale_styles(
                style_images_big,
                (1, int(content_scale * content_size[0]), int(content_scale * content_size[1])),
                args.style_scale,
            )
            # engine build + style capture are DEVICE work (several program
            # loads through a tunneled chip) — defer until a frame actually
            # needs optimizing so fully-resumed scales stay filesystem-only
            scale_state: dict = {}

            def get_ctx():
                if "ctx" not in scale_state:
                    scale_state["ctx"] = on_scale(current_size, style_images)
                return scale_state["ctx"]

            def get_engine():
                if "engine" not in scale_state:
                    scale_state["engine"] = frame_engine(get_ctx()) if frame_engine is not None else None
                return scale_state["engine"]

            device_chain = frame_engine is not None and not args.original_colors
            out_hw = scale_shape(content_size, content_scale)

            def get_hist_stats():
                if "hist" not in scale_state:
                    if device_chain and args.match_histograms:
                        from ..ops.frame_ops import style_hist_stats

                        scale_state["hist"] = style_hist_stats(
                            style_images_big[0], mode=args.match_histograms
                        )
                    else:
                        scale_state["hist"] = None
                return scale_state["hist"]

            for pass_n in range(args.passes_per_scale):
                # a pass reads flow artifacts when it warps (prev_warp first
                # pass) or feeds warped temporal targets (every later pass);
                # wait for the overlapped pre-pass only then
                first_pass = size_n == 0 and pass_n == 0
                consumes_flow = (args.init == "prev_warp") if first_pass else use_temporal_targets
                if flow_ready is not None and consumes_flow:
                    flow_ready()
                pastiche = None  # host-path chain (np) or device-path chain (jax.Array)
                if args.loop:
                    start_idx = random.randrange(0, len(frames) - 1)
                    frames = frames[start_idx:] + frames[:start_idx]

                if len(glob.glob(f"{output_dir}/{current_size}/{pass_n + 2}_*.png")) == len(frames):
                    print(f"Skipping pass: {pass_n + 1}, already done.")
                    frames = list(reversed(frames))
                    continue

                # first-ever pass with a chain-free init: frames are
                # INDEPENDENT (reference style.py:219-231 — no temporal
                # target, init from own content / fresh noise), so optimize
                # them as stacked batches: one device program per chunk
                if (
                    device_chain
                    and size_n == 0
                    and pass_n == 0
                    and args.init != "prev_warp"
                    and getattr(args, "frame_batch", 0) != 1
                ):
                    _device_first_pass_batched(
                        args, get_engine(), style_images, get_hist_stats(), out_hw,
                        content_scale, output_dir, current_size, pass_n, frames,
                        num_iters, saver,
                    )
                    frames = list(reversed(frames))
                    saver.drain()
                    continue

                pairs = list(zip(
                    frames + frames[: 11 if args.loop else 1],
                    frames[1:] + frames[: 10 if args.loop else 1],
                ))
                chain_k = _auto_chain_k(out_hw, args)
                n = -1
                while n + 1 < len(pairs):
                    n += 1
                    prev_frame, this_frame = pairs[n]
                    out_path = f"{output_dir}/{current_size}/{pass_n + 1}_{name(this_frame)}.png"
                    if os.path.isfile(out_path) and not n >= len(frames):
                        pastiche = None  # resume skip: reseed the chain from artifacts
                        continue
                    flow_direction = "forward" if pass_n % 2 == 0 else "backward"
                    flo_file = f"{output_dir}/flow/{flow_direction}_{name(prev_frame)}_{name(this_frame)}.flo"
                    first = size_n == 0 and pass_n == 0

                    if device_chain:
                        # chunk sequentially-chained frames into one scan
                        # program (wrap frames — j >= len(frames), possible
                        # only with --loop — read artifacts of the CURRENT
                        # pass, so they stay on the per-frame path)
                        idxs = [n]
                        if chain_k > 1:
                            while (
                                len(idxs) < chain_k
                                and idxs[-1] + 1 < min(len(pairs), len(frames))
                                and not os.path.isfile(
                                    f"{output_dir}/{current_size}/{pass_n + 1}_{name(pairs[idxs[-1] + 1][1])}.png"
                                )
                            ):
                                idxs.append(idxs[-1] + 1)
                        if len(idxs) > 1:
                            names = ", ".join(name(pairs[j][1]) for j in idxs)
                            print(f"Optimizing... size: {current_size}, pass: {pass_n + 1}, frames: {names}")
                            pastiche = _device_chain_chunk(
                                args, get_engine(), style_images, get_hist_stats(), out_hw,
                                content_scale, output_dir, current_size, prev_size, pass_n,
                                idxs, pairs, flow_direction, first, use_temporal_targets,
                                num_iters, pastiche, saver,
                            )
                            n = idxs[-1]
                            continue
                        print(f"Optimizing... size: {current_size}, pass: {pass_n + 1}, frame: {name(this_frame)}")
                        pastiche = _device_frame(
                            args, get_engine(), style_images, get_hist_stats(), out_hw, content_scale,
                            output_dir, current_size, prev_size, pass_n, n, len(frames),
                            prev_frame, this_frame, flo_file, flow_direction, first,
                            use_temporal_targets, num_iters, pastiche, saver, out_path,
                        )
                        continue
                    print(f"Optimizing... size: {current_size}, pass: {pass_n + 1}, frame: {name(this_frame)}")

                    content_frames = [
                        resize_bilinear_np(mio.preprocess(prev_frame), scale_factor=content_scale),
                        resize_bilinear_np(mio.preprocess(this_frame), scale_factor=content_scale),
                    ]
                    content_frames = [
                        match_histogram(f, style_images_big[0], mode=args.match_histograms) for f in content_frames
                    ]

                    temporal_target = None
                    temporal_weights = None
                    if first:
                        if args.init == "random":
                            pastiche = np.random.randn(*content_frames[1].shape).astype(np.float32) * 0.001
                        elif args.init == "prev_warp":
                            if pastiche is None:
                                pastiche = content_frames[0]
                            pastiche = warp(pastiche, flow_warp_map(flo_file, pastiche.shape[1:3]))
                        else:
                            pastiche = content_frames[1].copy()
                    else:
                        if pass_n == 0:
                            src_size = prev_size if n <= len(frames) else current_size
                            src_pass = args.passes_per_scale if n <= len(frames) else pass_n + 1
                        else:
                            src_size = current_size
                            src_pass = pass_n if n <= len(frames) else pass_n + 1
                        if pastiche is None:
                            ifile = f"{output_dir}/{src_size}/{src_pass}_{name(prev_frame)}.png"
                            pastiche = resize_bilinear_np(mio.preprocess(ifile), size=content_frames[0].shape[1:3])
                        bfile = f"{output_dir}/{src_size}/{src_pass}_{name(this_frame)}.png"
                        blend_image = resize_bilinear_np(mio.preprocess(bfile), size=content_frames[0].shape[1:3])

                        if use_temporal_targets:
                            # (prev frame, warp map) — the engine fuses the flow
                            # warp into the jitted optimisation program (one
                            # device call per frame; reference warps separately,
                            # style.py:273-276)
                            temporal_target = (pastiche, flow_warp_map(flo_file, pastiche.shape[1:3]))
                            weight_file = (
                                f"{output_dir}/flow/{flow_direction}_{name(prev_frame)}_{name(this_frame)}.png"
                            )
                            temporal_weights = resize_bilinear_np(
                                reliable_flow_weighting(weight_file), size=pastiche.shape[1:3]
                            )

                        pastiche = (1 - args.temporal_blend) * blend_image + args.temporal_blend * pastiche

                    output_image = optimize_frame(
                        get_ctx(), content_frames[1], pastiche, temporal_target, temporal_weights,
                        max(num_iters // args.passes_per_scale, 1),
                    )

                    pastiche = match_histogram(output_image, style_images_big[0], mode=args.match_histograms)
                    if pastiche.shape != content_frames[1].shape:
                        pastiche = resize_bilinear_np(pastiche, size=content_frames[1].shape[1:3])

                    disp = mio.deprocess(pastiche)
                    if args.original_colors:
                        from ..ops.colors import original_colors

                        disp = original_colors(mio.deprocess(content_frames[1]), disp)
                    disp.save(out_path)

                frames = list(reversed(frames))
                saver.drain()  # artifacts must exist before resume checks / mux

            saver.drain()
            mux_video(output_dir, current_size, args)
            prev_size = current_size
        if flow_ready is not None:
            flow_ready()  # flow artifacts must be complete when the run returns
    finally:
        saver.close()


def _capacity_kwargs(args) -> dict:
    """The engine configuration the capacity estimator needs, pulled from the
    run args (clip_video_style's host path never reaches these helpers, so
    missing attributes only need safe defaults)."""
    return dict(
        lbfgs_history=int(getattr(args, "lbfgs_num_correction", 100) or 100),
        lbfgs_method=getattr(args, "lbfgs_method", "compact") or "compact",
        compute_dtype=getattr(args, "compute_dtype", "float32") or "float32",
    )


def _auto_frame_batch(out_hw: tuple[int, int], requested: int, args=None) -> int:
    """Frames per batched program: the requested --frame_batch, or the
    capacity estimator's answer for the ACTUAL scale/optimizer/dtype/HBM
    (tuning.max_sizes.frames_per_program), rounded down to a power of two so
    chunk shapes (and compiles) stay few."""
    if requested and requested > 0:
        b = requested
    else:
        from ..tuning.max_sizes import frames_per_program

        b = frames_per_program(
            getattr(args, "model_file", "vgg19") or "vgg19",
            getattr(args, "optimizer", "lbfgs") or "lbfgs",
            out_hw,
            **_capacity_kwargs(args),
        )
    return 1 << (b.bit_length() - 1)


def _auto_chain_k(out_hw: tuple[int, int], args) -> int:
    """Chained-scan chunk length: the requested --frame_batch, or the
    capacity estimator's stacked-inputs answer
    (tuning.max_sizes.chain_frames_per_program)."""
    requested = getattr(args, "frame_batch", 0)
    if requested and requested > 0:
        return int(requested)
    from ..tuning.max_sizes import chain_frames_per_program

    return chain_frames_per_program(
        getattr(args, "model_file", "vgg19") or "vgg19",
        getattr(args, "optimizer", "lbfgs") or "lbfgs",
        out_hw,
        **_capacity_kwargs(args),
    )


def _device_first_pass_batched(
    args, engine, style_images, hist_stats, out_hw, content_scale,
    output_dir, current_size, pass_n, frames, num_iters, saver,
):
    """Optimize every unrendered frame of the first pass as stacked batches
    through ONE device program per chunk (engine.optimize_frames).  Exactly
    reproduces the per-frame path: frames here share no state (see the
    batched-runner docstring), and per-frame random-init seeds match the
    sequential loop's ``seed + n``."""
    n_frames = len(frames)
    this_frames = frames[1:] + frames[: 10 if args.loop else 1]
    todo: dict[str, tuple[int, str]] = {}
    for n, this_frame in enumerate(this_frames):
        out_path = f"{output_dir}/{current_size}/{pass_n + 1}_{name(this_frame)}.png"
        if os.path.isfile(out_path) and not n >= n_frames:
            continue
        # --loop wrap re-optimizes early frames; keep only the LAST
        # occurrence per artifact (sequential order would overwrite anyway,
        # and concurrent PNG writes to one path would race)
        todo[out_path] = (n, this_frame)

    items = sorted(todo.items(), key=lambda kv: kv[1][0])
    batch = _auto_frame_batch(out_hw, getattr(args, "frame_batch", 0), args)
    bsh = getattr(engine, "_frames_sharding", None)
    if bsh is not None and not (getattr(args, "frame_batch", 0) > 0):
        # a "frames" mesh axis shards each chunk n-ways (DP): per-chip
        # memory is batch/n frames, so the auto batch scales with n
        batch *= int(bsh(4).mesh.shape["frames"])
    iters = max(num_iters // args.passes_per_scale, 1)
    seed0 = int(getattr(args, "seed", 0) or 0)
    init_mode = "random" if args.init == "random" else "content"

    pos = 0
    while pos < len(items):
        chunk_size = min(batch, len(items) - pos)
        chunk_size = 1 << (chunk_size.bit_length() - 1)  # power-of-two shapes
        chunk = items[pos : pos + chunk_size]
        pos += chunk_size
        names = ", ".join(name(tf) for _, (_, tf) in chunk)
        print(f"Optimizing... size: {current_size}, pass: {pass_n + 1}, frames: {names}")
        stack = np.stack([mio.load_u8(tf) for _, (_, tf) in chunk])
        _, displays = engine.optimize_frames(
            stack, style_images, iters,
            out_hw=out_hw,
            content_scale=content_scale,
            blend_weights=args.style_blend_weights,
            init_mode=init_mode,
            hist_stats=hist_stats,
            seeds=[seed0 + n for _, (n, _) in chunk],
        )
        for i, (out_path, _) in enumerate(chunk):
            saver.submit(displays[i], out_path)


def _device_chain_chunk(
    args, engine, style_images, hist_stats, out_hw, content_scale,
    output_dir, current_size, prev_size, pass_n, idxs, pairs,
    flow_direction, first, use_temporal_targets, num_iters, chain, saver,
):
    """K sequentially-chained frames through ONE scan program
    (engine.optimize_frame_chain): stacked per-frame inputs go up once, K
    display images come down once; the pastiche chains on device.  Mirrors
    _device_frame's init/blend/temporal semantics for the two chained modes
    (first-pass prev_warp, reference style.py:223-228; later-pass blend +
    warped temporal target, style.py:232-286)."""
    import jax.numpy as jnp

    from PIL import Image

    iters = max(num_iters // args.passes_per_scale, 1)
    seed0 = int(getattr(args, "seed", 0) or 0)
    src_size = prev_size if pass_n == 0 else current_size
    src_pass = args.passes_per_scale if pass_n == 0 else pass_n

    contents, blends, flows, weights, out_paths, seeds = [], [], [], [], [], []
    for j in idxs:
        p_frame, t_frame = pairs[j]
        out_paths.append(f"{output_dir}/{current_size}/{pass_n + 1}_{name(t_frame)}.png")
        contents.append(mio.load_u8(t_frame))
        seeds.append(seed0 + j)
        flo = f"{output_dir}/flow/{flow_direction}_{name(p_frame)}_{name(t_frame)}.flo"
        if first:  # prev_warp: init = warp(chain), no temporal target
            flows.append(read_flo(flo))
        else:
            blends.append(mio.load_u8(f"{output_dir}/{src_size}/{src_pass}_{name(t_frame)}.png"))
            if use_temporal_targets:
                flows.append(read_flo(flo))
                wfile = f"{output_dir}/flow/{flow_direction}_{name(p_frame)}_{name(t_frame)}.png"
                weights.append(np.asarray(Image.open(wfile).convert("L")))

    if chain is None:
        p_frame = pairs[idxs[0]][0]
        if first:
            saver.drain()  # the previous frame's artifact may still be queued
            prev_art = f"{output_dir}/{current_size}/{pass_n + 1}_{name(p_frame)}.png"
            if os.path.isfile(prev_art):
                chain = jnp.asarray(resize_bilinear_np(mio.preprocess(prev_art), size=out_hw))
            else:
                chain = engine.prep_frame(mio.load_u8(p_frame), out_hw, hist_stats)
        else:
            ifile = f"{output_dir}/{src_size}/{src_pass}_{name(p_frame)}.png"
            chain = jnp.asarray(resize_bilinear_np(mio.preprocess(ifile), size=out_hw))

    stacked = {"content_u8": np.stack(contents)}
    if first:
        mode, use_temp = "warp_prev", False
        stacked["flow"] = np.stack(flows).astype(np.float32)
    else:
        mode, use_temp = "blend", bool(use_temporal_targets)
        stacked["blend"] = np.stack(blends)
        if use_temporal_targets:
            stacked["flow"] = np.stack(flows).astype(np.float32)
            stacked["weights_u8"] = np.stack(weights)

    chain, displays = engine.optimize_frame_chain(
        chain, stacked, style_images, iters,
        out_hw=out_hw,
        content_scale=content_scale,
        blend_weights=args.style_blend_weights,
        init_mode=mode,
        use_temporal=use_temp,
        temporal_blend=float(args.temporal_blend),
        hist_stats=hist_stats,
        seeds=seeds,
    )
    for i, op in enumerate(out_paths):
        saver.submit(displays[i], op)
    return chain


def _device_frame(
    args, engine, style_images, hist_stats, out_hw, content_scale,
    output_dir, current_size, prev_size, pass_n, n, n_frames,
    prev_frame, this_frame, flo_file, flow_direction, first,
    use_temporal_targets, num_iters, chain, saver, out_path,
):
    """One frame through the fused device program; returns the new device
    chain pastiche.  Mirrors the host path's init/blend/temporal semantics
    (reference style.py:192-297)."""
    import jax.numpy as jnp

    from PIL import Image

    this_u8 = mio.load_u8(this_frame)
    kwargs: dict = {}
    if first:
        if args.init == "random":
            mode = "random"
            kwargs["seed"] = int(getattr(args, "seed", 0) or 0) + n
        elif args.init == "prev_warp":
            mode = "warp_prev"
            kwargs["flow"] = read_flo(flo_file)
            if chain is None:
                saver.drain()  # the previous frame's artifact may still be queued
                prev_art = f"{output_dir}/{current_size}/{pass_n + 1}_{name(prev_frame)}.png"
                if os.path.isfile(prev_art):
                    chain = jnp.asarray(resize_bilinear_np(mio.preprocess(prev_art), size=out_hw))
                else:
                    chain = engine.prep_frame(mio.load_u8(prev_frame), out_hw, hist_stats)
            kwargs["prev"] = chain
        else:
            mode = "content"
    else:
        if pass_n == 0:
            src_size = prev_size if n <= n_frames else current_size
            src_pass = args.passes_per_scale if n <= n_frames else pass_n + 1
        else:
            src_size = current_size
            src_pass = pass_n if n <= n_frames else pass_n + 1
        if src_size == current_size and src_pass == pass_n + 1:
            saver.drain()  # loop-wrap reads artifacts of the CURRENT pass
        if chain is None:
            ifile = f"{output_dir}/{src_size}/{src_pass}_{name(prev_frame)}.png"
            chain = jnp.asarray(resize_bilinear_np(mio.preprocess(ifile), size=out_hw))
        mode = "blend"
        kwargs["prev"] = chain
        kwargs["blend"] = mio.load_u8(f"{output_dir}/{src_size}/{src_pass}_{name(this_frame)}.png")
        kwargs["temporal_blend"] = float(args.temporal_blend)
        if use_temporal_targets:
            kwargs["flow"] = read_flo(flo_file)
            weight_file = f"{output_dir}/flow/{flow_direction}_{name(prev_frame)}_{name(this_frame)}.png"
            kwargs["weights_u8"] = np.asarray(Image.open(weight_file).convert("L"))
            kwargs["use_temporal"] = True

    pastiche, display = engine.optimize_frame(
        this_u8,
        style_images,
        max(num_iters // args.passes_per_scale, 1),
        out_hw=out_hw,
        blend_weights=args.style_blend_weights,
        init_mode=mode,
        hist_stats=hist_stats,
        content_scale=content_scale,
        **kwargs,
    )
    saver.submit(display, out_path)
    return pastiche


__all__ = ["run_video_style_passes"]
