"""HBM-aware maximum-size autotuner (reference: max-sizes.py).

The reference OOM-probes every (model x optimizer x #GPUs) combination by
actually running 150 iterations and catching CUDA OOM (max-sizes.py:59-111).
On TPU the compiled program's memory footprint is known *before* execution,
so the default probe compiles the jitted style step per candidate size and
reads XLA's memory analysis — deterministic, and no chip time burned on
failure.  A fast analytic estimator ("estimate") models the same footprint
without compiling (activations + backward + optimizer state), for instant
tables and tests.

Like the reference: sizes grow by sqrt(2) from the previous safe size and
results are rounded to multiples of 32 (max-sizes.py:36-41, 96-97); the
table maps "model,optimizer,devices" -> {safe max, true max}.  Written to
configs/max-sizes-{hbm}GB-{n}chip.json.

Usage: python -m maua_style_tpu.tuning.max_sizes [--method estimate|analysis]
"""

from __future__ import annotations

import json
import math
import os

import numpy as np

DEFAULT_MODELS = ("vgg19", "vgg16", "sod", "nyud", "prune", "nin")
DEFAULT_OPTIMIZERS = ("lbfgs", "adam")


def _round32(x: float) -> int:
    return int(x // 32 * 32)


def _loss_cfg_for(model: str):
    """Per-arch default loss layers (NIN has its own names, see
    configs/scaling-img.json)."""
    from ..losses import LossConfig

    if model == "nin":
        return LossConfig(
            content_layers=("relu8",),
            style_layers=("relu1", "relu3", "relu5", "relu7", "relu9", "relu11"),
        )
    return LossConfig()


def estimate_step_bytes(model: str, optimizer: str, size: int, lbfgs_history: int = 100,
                        layers=None, lbfgs_method: str = "compact", devices: int = 1,
                        compute_dtype: str = "float32", _split_fixed: bool = False):
    """Analytic PER-CHIP footprint of one jitted style-transfer step at
    size x size over ``devices`` chips (spatial "space" mesh axis).

    Counts pastiche + stored forward activations (+~1x for backward buffers)
    + Gram workspaces + optimizer state.  Constants calibrated against XLA
    memory analysis at 1024^2 on v5e.  Under GSPMD spatial sharding the
    pastiche, activations and optimizer state (a pytree shaped like the
    pastiche) all shard with the height axis; weights and Gram workspaces
    replicate, and halo exchange adds a small per-boundary overlap.
    """
    from ..models import select_model, truncate_spec

    cfg = _loss_cfg_for(model)
    spec = truncate_spec(select_model(model, "max"), cfg.all_layers)

    f32 = 4
    act_el = 2 if compute_dtype in ("bfloat16", "bf16") else 4  # activation storage
    h = w = size
    act_bytes = 0
    stem_bytes = 0
    ch = spec.in_ch
    for layer in spec.layers:
        if layer.kind == "conv":
            # large-kernel strided stems run through space-to-depth packing
            # (ops/space_to_depth.py), so no extra stem buffers remain
            h2 = (h + 2 * layer.pad[0] - layer.kernel[0]) // layer.stride[0] + 1
            w2 = (w + 2 * layer.pad[1] - layer.kernel[1]) // layer.stride[1] + 1
            h, w, ch = h2, w2, layer.out_ch
            act_bytes += h * w * ch * f32
        elif layer.kind in ("maxpool", "avgpool"):
            h = -(-(h - layer.kernel[0]) // layer.stride[0]) + 1 if layer.ceil_mode else (h - layer.kernel[0]) // layer.stride[0] + 1
            w = -(-(w - layer.kernel[1]) // layer.stride[1]) + 1 if layer.ceil_mode else (w - layer.kernel[1]) // layer.stride[1] + 1
            act_bytes += h * w * ch * f32

    pixels = size * size * 3 * f32
    # prune's odd channel counts (22/24/41/...) pay ~2x in lane-padded XLA
    # buffers (measured); nin's overhead vanished with the s2d stem
    arch_fudge = 2.1 if model == "prune" else 1.0
    total = pixels  # pastiche
    total += (act_bytes * (act_el / f32) * 2.1 + stem_bytes) * arch_fudge  # fwd residuals + bwd buffers (calibrated at f32)
    if optimizer == "adam":
        total += 2 * pixels  # mu, nu
    else:
        # s/y circular history plus transient copies during the in-scan
        # buffer updates; the compact method adds recombination transposes
        # (both factors measured via XLA memory analysis).  The serving
        # config stores histories in bf16 (engine/optimize.py), halving the
        # history term
        factor = 5.3 if lbfgs_method == "compact" else 4.0
        factor *= act_el / f32 if compute_dtype in ("bfloat16", "bf16") else 1.0
        total += factor * lbfgs_history * pixels + 6 * pixels
    if devices > 1:
        # sharded terms split across the space axis; ~3% halo/all-gather slack
        total = total / devices * 1.03
    params_bytes = 0
    cin = spec.in_ch
    for l in spec.conv_layers:
        params_bytes += l.kernel[0] * l.kernel[1] * cin * l.out_ch * f32
        cin = l.out_ch
    fixed = params_bytes + 64 * 1024 * 1024  # weights + runtime slack (replicated)
    if _split_fixed:
        return int(total), int(fixed)
    return int(total + fixed)


def frames_per_program(
    model: str,
    optimizer: str,
    out_hw: tuple[int, int],
    *,
    lbfgs_history: int = 100,
    lbfgs_method: str = "compact",
    compute_dtype: str = "float32",
    hbm: int | None = None,
    cap: int = 16,
) -> int:
    """How many independent frames fit as ONE stacked-batch device program.

    Derived from the same calibrated per-chip footprint model the max-size
    autotuner uses (estimate_step_bytes) at the ACTUAL frame size, optimizer,
    history and dtype — each stacked frame pays the full per-frame step state
    (pastiche + activations + backward + optimizer state), while weights and
    runtime slack are shared.  70% of HBM is the budget (the analytic model
    is calibrated to XLA's memory analysis within ~±15%; the remainder
    absorbs fragmentation and transient fusion buffers).
    """
    size = max(32, _round32(math.sqrt(out_hw[0] * out_hw[1]) + 31))
    per_frame, fixed = estimate_step_bytes(
        model, optimizer, size, lbfgs_history, lbfgs_method=lbfgs_method,
        compute_dtype=compute_dtype, _split_fixed=True,
    )
    budget = (hbm if hbm is not None else hbm_bytes()) * 0.7 - fixed
    return int(max(1, min(cap, budget // max(per_frame, 1))))


def chain_frames_per_program(
    model: str,
    optimizer: str,
    out_hw: tuple[int, int],
    *,
    lbfgs_history: int = 100,
    lbfgs_method: str = "compact",
    compute_dtype: str = "float32",
    hbm: int | None = None,
    cap: int = 16,
) -> int:
    """How many sequentially-chained frames to fold into one scan program.

    A chained scan optimises ONE frame at a time (the pastiche is the scan
    carry), so per-chunk memory is a single frame's step state plus the
    STACKED per-frame inputs/outputs: content u8 (3 B/px), flow (8 B/px),
    reliability weights (4 B/px), blend source u8 (3 B/px) and the display
    image down (3 B/px) ≈ 21 B/px each way with alignment — call it 24 B/px.
    The chunk length is what fills the HBM left over by one frame's state,
    capped: longer chunks only amortise per-program dispatch, and the
    marginal gain above ~16 frames is noise while the compile-shape count
    grows (one program per distinct chunk length).
    """
    size = max(32, _round32(math.sqrt(out_hw[0] * out_hw[1]) + 31))
    per_frame, fixed = estimate_step_bytes(
        model, optimizer, size, lbfgs_history, lbfgs_method=lbfgs_method,
        compute_dtype=compute_dtype, _split_fixed=True,
    )
    budget = (hbm if hbm is not None else hbm_bytes()) * 0.7 - fixed - per_frame
    stacked_inputs = out_hw[0] * out_hw[1] * 24
    return int(max(1, min(cap, budget // max(stacked_inputs, 1))))


def _compiled_step_bytes(model: str, optimizer: str, size: int, devices: int = 1,
                         compute_dtype: str = "bfloat16", topology=None,
                         fast: bool = True) -> int:
    """Compile the actual jitted step at this size and read XLA's memory
    analysis (argument + output + temp).  With ``devices`` > 1 the step is
    GSPMD-compiled over a "space" mesh (spatially sharded pastiche) and the
    analysis reports the per-chip footprint.  ``topology`` (a
    jax.experimental.topologies description) AOT-targets a real TPU topology
    without owning the chips — the preferred way to emit n-chip tables;
    the fallback is a virtual CPU mesh
    (XLA_FLAGS=--xla_force_host_platform_device_count=N)."""
    import jax
    import jax.numpy as jnp

    from ..engine import StyleEngine
    from ..models import select_model, init_params

    sharding = None
    if topology is not None:
        import numpy as _np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        topo_devices = list(topology.devices)
        if len(topo_devices) < devices:
            raise RuntimeError(f"topology has {len(topo_devices)} devices, need {devices}")
        mesh = Mesh(_np.asarray(topo_devices[:devices]).reshape(devices), ("space",))
        sharding = NamedSharding(mesh, P(None, "space") if devices > 1 else P())
    elif devices > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import build_mesh

        if len(jax.devices()) < devices:
            raise RuntimeError(f"need {devices} devices for the sharded probe, have {len(jax.devices())}")
        mesh = build_mesh(jax.devices()[:devices], [("space", devices)])
        sharding = NamedSharding(mesh, P(None, "space"))

    cfg = _loss_cfg_for(model)
    spec = select_model(model, "max")
    params = init_params(spec, 0)
    bf16 = compute_dtype in ("bfloat16", "bf16")
    engine = StyleEngine(
        spec, params, cfg, optimizer=optimizer, learning_rate=1.0, pastiche_sharding=sharding,
        compute_dtype=jnp.bfloat16 if bf16 else jnp.float32,
        precision="default" if bf16 else "highest",
    )

    # the probe is COMPILE-ONLY: every argument is a ShapeDtypeStruct, so no
    # device program runs and no HBM is touched — sizes beyond the chip's
    # capacity compile fine and the analysis still reports their footprint
    shape = (1, size, size, 3)
    sds = jax.ShapeDtypeStruct
    abstract = lambda tree: jax.tree_util.tree_map(lambda a: sds(a.shape, a.dtype), tree)  # noqa: E731
    style_shapes = jax.eval_shape(engine._jit_style, params, sds(shape, jnp.float32), 1.0)
    targets = {
        # the real runner captures content targets in-graph (content_img);
        # the probe must match so the measured footprint includes it
        "content_img": sds(shape, jnp.float32),
        "style": style_shapes,
    }
    opt = engine._make_optimizer()
    pastiche = (
        sds(shape, jnp.float32, sharding=sharding) if sharding is not None else sds(shape, jnp.float32)
    )
    opt_state = jax.eval_shape(opt.init, pastiche)
    runner = engine._runner(10, (), False)
    lowered = runner.lower(abstract(params), pastiche, opt_state, targets, sds((1, 1, 1, 1), jnp.float32))
    # minimal scheduling effort compiles ~7x faster; the buffer-assignment
    # footprint it reports is within ~2% of (and slightly above, i.e.
    # conservative vs) the default-effort compile at 1024² on v5e
    compiled = lowered.compile({"exec_time_optimization_effort": -1.0} if fast else None)
    mem = compiled.memory_analysis()
    if mem is None:
        raise RuntimeError("backend does not expose memory analysis")
    return int(mem.argument_size_in_bytes + mem.output_size_in_bytes + mem.temp_size_in_bytes)


def hbm_bytes() -> int:
    import jax

    stats = jax.devices()[0].memory_stats() or {}
    return int(stats.get("bytes_limit", 16 * 1024 ** 3))


def probe_max_sizes(
    models=DEFAULT_MODELS,
    optimizers=DEFAULT_OPTIMIZERS,
    method: str = "estimate",
    start_size: int = 512,
    budget_bytes: int | None = None,
    verbose: bool = True,
    devices: int = 1,
    compute_dtype: str = "bfloat16",
    seed_table: dict | None = None,
    topology=None,
    topology_name: str | None = None,
) -> dict:
    """Build the capacity table (reference max-sizes.py:59-111); ``devices``
    probes the spatially-sharded step over an n-chip mesh (the analogue of
    the reference's 2-GPU columns, config/max-sizes-2x11GB.json:62-121).
    ``topology`` AOT-targets a TPU topology for the analysis compiles.

    The boundary search interpolates on the MEASURED footprint rather than
    bisecting on fit/no-fit: bytes(s) is nearly affine in s², so a
    quadratic model through the best fitting and smallest failing probes
    lands within a rung or two of the x32 boundary — ~3-4 compiles per
    combo instead of ~7 (analysis compiles cost ~25-60 s each).  TPU AOT
    compiles abort outright when buffer assignment exceeds HBM; the error
    text still carries the attempted footprint ("Used 16.59G of 15.75G"),
    which the search parses and uses as a model point."""
    import re

    budget = budget_bytes if budget_bytes is not None else hbm_bytes()

    def probe_bytes(model, optimizer, size):
        """Footprint at ``size`` in bytes, or None if the probe failed
        without reporting one (counts as over budget)."""
        try:
            if method == "estimate":
                return estimate_step_bytes(model, optimizer, size, devices=devices, compute_dtype=compute_dtype)
            return _compiled_step_bytes(model, optimizer, size, devices=devices,
                                        compute_dtype=compute_dtype, topology=topology)
        except Exception as e:  # compile-level OOM counts as failure
            m = re.search(r"Used ([0-9.]+)([GMK]) of", str(e))
            if m:
                unit = {"G": 1024 ** 3, "M": 1024 ** 2, "K": 1024}[m.group(2)]
                return int(float(m.group(1)) * unit)
            if verbose:
                print(f"{model}+{optimizer}@{size}: probe error {str(e)[:200]}")
            return None

    table: dict[str, dict] = {}
    prev_safe = start_size
    for model in models:
        for optimizer in optimizers:
            seed = (seed_table or {}).get(f"{model},{optimizer},{devices}", {}).get("safe_max_size")
            size = _round32(seed) if seed else max(_round32(prev_safe / math.sqrt(2)), 256)
            size = max(size, 64)
            fit = None   # (size, bytes) — largest size measured under budget
            fail = None  # (size, bytes|None) — smallest size measured over
            probed: set[int] = set()
            for _ in range(24):  # hard cap; typical combo needs 3-4 probes
                probed.add(size)
                b = probe_bytes(model, optimizer, size)
                if verbose and method != "estimate":
                    gib = f"{b / 1024 ** 3:.2f} GiB" if b is not None else "?"
                    print(f"  {model}+{optimizer}@{size}: {gib}", flush=True)
                if b is not None and b <= budget:
                    if fit is None or size > fit[0]:
                        fit = (size, b)
                else:
                    if fail is None or size < fail[0]:
                        fail = (size, b)
                # converged: bracket is x32-tight
                if fit and fail and fail[0] - fit[0] <= 32:
                    break
                # choose the next candidate
                if fit is None:
                    if fail[0] <= 64:
                        break
                    size = max(_round32(fail[0] / math.sqrt(2)), 32)
                elif fail is None:
                    s1, b1 = fit
                    pred = s1 * math.sqrt(budget / max(b1, 1))
                    size = max(min(_round32(pred), 16352), s1 + 32)
                    if s1 >= 16320:
                        break  # effectively unbounded
                else:
                    (s1, b1), (s2, b2) = fit, fail
                    if b2 is not None and s2 * s2 > s1 * s1:
                        alpha = (b2 - b1) / (s2 * s2 - s1 * s1)
                        beta = b1 - alpha * s1 * s1
                        val = (budget * 0.999 - beta) / alpha if alpha > 0 else -1.0
                        size = _round32(math.sqrt(val)) if val > 0 else _round32((s1 + s2) / 2)
                    else:
                        size = _round32((s1 + s2) / 2)
                    size = min(max(size, s1 + 32), s2 - 32)
                if size in probed:  # model stalled on a probed rung: bisect
                    if fit and fail:
                        size = _round32((fit[0] + fail[0]) / 2)
                        size = min(max(size, fit[0] + 32), fail[0] - 32)
                    if size in probed:
                        break
            safe = fit[0] if fit else None
            true = fail[0] if fail else None
            key = f"{model},{optimizer},{devices}"
            table[key] = {
                "model": model,
                "optimizer": optimizer,
                "devices": devices,
                "safe_max_size": safe,
                "true_max_size": true,
                "budget_gb": round(budget / 1024 ** 3, 2),
                "method": method,
                "compute_dtype": compute_dtype,
                **({"topology": topology_name} if topology_name else {}),
            }
            if verbose:
                print(f"{key}: safe {safe} / true {true}")
            prev_safe = safe or prev_safe
    return table


def jax_device_count() -> int:
    import jax

    return len(jax.devices())


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser("max_sizes")
    ap.add_argument("--method", choices=["estimate", "analysis"], default="estimate")
    ap.add_argument("--models", default=",".join(DEFAULT_MODELS))
    ap.add_argument("--optimizers", default=",".join(DEFAULT_OPTIMIZERS))
    ap.add_argument("--devices", type=int, default=1,
                    help="mesh size for the sharded probe (analysis mode needs that many "
                    "JAX devices — use XLA_FLAGS=--xla_force_host_platform_device_count=N)")
    ap.add_argument("--hbm_gb", type=float, default=None,
                    help="override the per-chip HBM budget (default: this chip's)")
    ap.add_argument("--compute_dtype", default="bfloat16",
                    help="serving config dtype for the probed step (bfloat16 also stores "
                    "L-BFGS histories in bf16, matching the engine)")
    ap.add_argument("--seed_from", default=None,
                    help="existing table JSON whose safe sizes seed the probe ladder")
    ap.add_argument("--topology", default=None,
                    help="AOT TPU topology for analysis compiles (e.g. 'v5e:2x2'), so "
                    "n-chip tables carry real TPU layouts without owning n chips")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    seed_table = None
    if args.seed_from and os.path.exists(args.seed_from):
        with open(args.seed_from) as f:
            seed_table = json.load(f)

    topology = None
    if args.topology:
        from jax.experimental import topologies

        topology = topologies.get_topology_desc(args.topology, "tpu")

    budget = int(args.hbm_gb * 1024 ** 3) if args.hbm_gb else None
    table = probe_max_sizes(
        models=args.models.split(","),
        optimizers=args.optimizers.split(","),
        method=args.method,
        devices=args.devices,
        budget_bytes=budget,
        compute_dtype=args.compute_dtype,
        seed_table=seed_table,
        topology=topology,
        topology_name=args.topology or None,
    )
    gb = round((budget or hbm_bytes()) / 1024 ** 3)
    out = args.out or f"configs/max-sizes-{gb}GB-{args.devices}chip.json"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(table, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
