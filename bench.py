"""Benchmark: megapixel-iterations/sec/chip for 1024x1024 Gram-loss style
transfer (the BASELINE.json north-star metric).

Measures the fully-jitted VGG-19 style-transfer step (feature forward,
Gram+content+TV losses with gradient normalisation, backward, Adam update)
as a ``lax.scan`` on one chip, end to end, at the reference's default flag
settings (content_weight 5, style_weight 100, tv 1e-3, relu4_2 +
relu{1..5}_1 layers).

Baseline: the reference publishes no throughput numbers (BASELINE.md), so the
comparison point is the driver's target formulation — the reference pipeline
(torch VGG-19, per-iteration python loss accumulation + .item() sync,
optim.py:201-241) on an RTX 2080 Ti, estimated at ~6.2 MP-iters/s
(~0.17 s/iter at 1024²; 2080 Ti VGG-19 fwd+bwd ≈ 110 ms + loss/backward/sync
overhead).  vs_baseline > 5 meets the BASELINE.json wall-clock target.

Output protocol: a complete JSON result line is printed (and flushed) as
soon as each battery stage lands, each line a superset of the previous —
the driver parses the LAST line, so every stage that completes only
improves the artifact, and an external kill (the driver's timeout SIGTERM,
which no in-process error handling can catch) costs at most the stage in
flight, never the metrics already printed.

A global wall-clock budget (env ``MAUA_BENCH_BUDGET_S``, default 1200 s)
gates the optional stages: a stage whose conservative cost estimate no
longer fits is skipped and listed under ``skipped_after_budget``.

Default battery: image (adam + lbfgs MP-it/s), video frames/min, img_vid
window-path MP-it/s, NCA steps/s.  CLIP cold-start (two fresh subprocesses,
~7 min each through a tunneled chip) is OPT-IN via ``--clip``; its standing
record lives in PERF.md.
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

try:
    # the host side of a tunneled-TPU program is dispatch-bound: concurrent
    # host load contaminates measured rates 5-60x (PERF.md).  The bench runs
    # as root on these boxes; claim scheduler priority so a busy driver host
    # measures the device, not its own load average.
    os.nice(-10)
except OSError:
    pass

REFERENCE_BASELINE_MP_ITERS_PER_SEC = 6.2  # est. reference @ RTX 2080 Ti, see module docstring
# reference vid_img on a 2080 Ti at 512², 50 iters/frame: ~0.17 s/iter-MP
# => 50 iters × 0.26 MP ≈ 2.2 s optimisation + flow/io overhead ≈ ~20 frames/min
REFERENCE_BASELINE_VIDEO_FRAMES_PER_MIN = 20.0


def measure_video_frames_per_min(n_small: int = 4, n_big: int = 12, size: int = 512, iters: int = 50) -> float:
    """Styled video frames/min through the REAL vid_img pipeline at 512².

    Marginal rate via a two-run slope: time a 4-frame and a 12-frame run
    (each from clean output artifacts, so flow prepass and per-frame work
    are both included) and divide the extra frames by the extra time.  The
    slope cancels one-time costs that don't scale with video length
    (compiles / executable loads over the chip tunnel, style-target capture,
    engine build).
    """
    from PIL import Image

    from maua_style_tpu import config
    from maua_style_tpu.pipelines.vid_img import vid_img
    n_frames = n_big
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="maua_bench_vid_")
    # smooth-ish synthetic frames so flow nets see structure
    base = rng.random((size // 8, size // 8, 3)).astype(np.float32)
    frames = []
    for t in range(n_frames):
        img = np.asarray(
            Image.fromarray((base * 255).astype(np.uint8)).resize((size, size), Image.BILINEAR)
        )
        frames.append(np.roll(img, shift=3 * t, axis=1))
    stack = np.stack(frames).astype(np.uint8)
    np.save(f"{tmp}/vid.npy", stack)
    np.save(f"{tmp}/vid_small.npy", stack[:n_small])
    Image.fromarray((rng.random((size, size, 3)) * 255).astype(np.uint8)).save(f"{tmp}/style.png")

    def run(out, content=None):
        args = config.get_args([
            "--content", content or f"{tmp}/vid.npy",
            "--style", f"{tmp}/style.png",
            "--output_dir", out,
            "--image_sizes", str(size),
            "--num_iters", str(iters),
            "--passes_per_scale", "1",
            "--flow_models", "spynet",
            "--init", "content",
            "--seed", "0",
            "--scaling_args", f"{tmp}/missing.json",
            "--allow_random_weights",  # bench env ships no flow checkpoints
            # serving config (configs/args-vid.json), same stance as the image
            # metric above: the CLI default stays the f32/highest parity
            # config, which runs the whole frame program ~4.4x slower
            "--compute_dtype", "bfloat16",
            "--precision", "default",
        ])
        vid_img(args)

    # compile + executable-load pass: the BIG run covers every program shape
    # the timed runs need (its frame/flow-pair chunk sizes are a superset of
    # the small run's), so neither timed run pays a compile
    run(f"{tmp}/warm")
    start = time.perf_counter()
    run(f"{tmp}/t_small", f"{tmp}/vid_small.npy")
    t_small = time.perf_counter() - start
    start = time.perf_counter()
    run(f"{tmp}/t_big")
    t_big = time.perf_counter() - start
    shutil.rmtree(tmp, ignore_errors=True)
    return (n_big - n_small) / max(t_big - t_small, 1e-9) * 60.0


def measure_img_vid_mp_iters(
    size: int = 256, n_frames: int = 12, gfw: int = 6, iters: int = 50, optimizer: str = "lbfgs"
) -> dict:
    """MP-it/s through the temporal Gram *window* path (img_vid / dynamic
    textures, reference style.py:76-142 + optim.py:114-170).

    Fixed schedule: a ``n_frames``-frame pastiche at ``size``² optimised in
    circular ``gfw``-frame windows (ceil(T/gfw)+1 window runs, overlap-masked
    grads) against a static+dynamic Gram target captured from an
    ``n_frames``-frame style video.  Rate is the marginal slope between an
    ``iters`` and a ``2*iters`` run (cancels the per-call style-video target
    capture, compiles and tunnel transfers).  Megapixels count the EFFECTIVE
    pastiche (T × size² per iteration, matching tools/bench_img_vid.py): the
    wrap-around window re-covers the seam, so its frames are schedule
    overhead, not extra throughput.
    """
    import jax.numpy as jnp

    from maua_style_tpu.engine import StyleEngine
    from maua_style_tpu.losses import LossConfig
    from maua_style_tpu.models import select_model, init_params

    spec = select_model("vgg19", "max")
    params = init_params(spec, seed=0)
    engine = StyleEngine(
        spec, params, LossConfig(), optimizer=optimizer, learning_rate=1.0,
        precision="default", compute_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    content = rng.random((1, size, size, 3), np.float32) * 255 - 128
    style_video = rng.random((n_frames, size, size, 3), np.float32) * 255 - 128

    def fresh_init():
        return rng.standard_normal((n_frames, size, size, 3)).astype(np.float32) * 0.001

    def run(n):
        return engine.optimize(
            content, [style_video], fresh_init(), n,
            transfer_type="img_vid", blend_weights=[1.0], gram_frame_window=gfw,
        )

    mp_per_iter = n_frames * size * size / 1e6
    run(iters)
    run(2 * iters)
    rates = []
    for _ in range(3):
        start = time.perf_counter()
        run(iters)
        t_n = time.perf_counter() - start
        start = time.perf_counter()
        run(2 * iters)
        t_2n = time.perf_counter() - start
        rates.append(mp_per_iter * iters / max(t_2n - t_n, 1e-9))
    _check_finite("img_vid", engine.last_loss_log)
    return {
        "img_vid_mp_iters_per_sec": round(float(np.median(rates)), 3),
        "img_vid_config": {"size": size, "frames": n_frames, "gram_frame_window": gfw,
                           "optimizer": optimizer},
    }


def measure_nca_steps_per_sec(steps: int = 50, grid: int = 128) -> float:
    """NCA training steps/sec at the reference configuration (pool 1024,
    batch 4, 128² grid, VGG-16 Gram style loss, 32-96-step rollouts;
    reference NCA_train.py:197-252).  Marginal slope between an N and a 2N
    run so compiles and executable loads cancel.  Random VGG weights are
    fine: step cost does not depend on weight values."""
    os.environ.setdefault("MAUA_ALLOW_RANDOM_WEIGHTS", "1")
    from PIL import Image

    from maua_style_tpu.pipelines.nca_train import train

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="maua_bench_nca_")
    Image.fromarray(rng.integers(0, 255, (128, 128, 3), dtype=np.uint8).astype(np.uint8)).save(
        f"{tmp}/style.png"
    )

    def run(n):
        train(f"{tmp}/style.png", f"{tmp}/out", n_steps=n, grid_size=grid,
              log_every=n, save_every=0, seed=0)

    run(steps)
    run(2 * steps)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(steps)
        t_n = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(2 * steps)
        t_2n = time.perf_counter() - t0
        rates.append(steps / max(t_2n - t_n, 1e-9))
    shutil.rmtree(tmp, ignore_errors=True)
    return float(np.median(rates))


def measure_clip_startup_s(timeout_s: float = 1500.0) -> dict:
    """CLIP+VQGAN cold-process time-to-first-iteration with a warm persistent
    compile cache — the restart cost a user pays (reference rebuilds
    everything per process, clip_vqgan.py:525).  Runs tools/bench_startup.py
    twice in fresh subprocesses: the first populates the compile cache, the
    second is the reported figure (<90 s = the round-2 target)."""
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "bench_startup.py")
    env = {**os.environ, "MAUA_ALLOW_RANDOM_WEIGHTS": "1"}
    last = None
    for _ in range(2):
        proc = subprocess.run(
            [sys.executable, script], capture_output=True, text=True, timeout=timeout_s, env=env,
        )
        if proc.returncode != 0:
            raise RuntimeError(f"bench_startup failed: {proc.stderr[-300:]}")
        last = json.loads(proc.stdout.strip().splitlines()[-1])
    return {"clip_startup_s": last["total_s"], "clip_startup_phases": {
        k: last[k] for k in ("imports_s", "engine_build_s", "first_chunk_s")}}


def _require_backend(timeout_s: float = 600.0) -> None:
    """Fail fast with a JSON error line if device init hangs (a tunneled TPU
    backend retries its connection forever when the tunnel is down; a bench
    that never returns loses the whole artifact instead of explaining itself)."""
    import threading

    ok = threading.Event()

    def probe():
        import jax

        jax.devices()
        ok.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not ok.is_set():
        print(json.dumps({
            "metric": "megapixel_iters_per_sec_per_chip_1024_gram",
            "value": None,
            "unit": "MP-iters/s/chip",
            "error": f"device backend unavailable (init timed out after {timeout_s:.0f}s; tunnel down?)",
        }))
        sys.exit(1)


def _check_finite(label: str, values) -> None:
    """NaN/inf in a benchmark artifact masks real overflow regressions and
    self-undermines every number next to it — fail loud instead."""
    arr = np.asarray(values, np.float64)
    if not np.isfinite(arr).all():
        raise FloatingPointError(f"{label}: non-finite values in measured losses/metrics")


def main():
    t_start = time.monotonic()
    budget_s = float(os.environ.get("MAUA_BENCH_BUDGET_S", "1200"))
    _require_backend()
    import jax.numpy as jnp

    from maua_style_tpu.engine import StyleEngine
    from maua_style_tpu.losses import LossConfig
    from maua_style_tpu.models import select_model, init_params

    size = 1024
    iters_timed = 100
    # production-serving config: bf16 activations, f32 Gram/loss accumulation
    # (converges to the same loss as f32; see PERF.md).  --fidelity benches
    # the full-f32 parity configuration instead.
    fidelity = "--fidelity" in sys.argv
    precision = "highest" if fidelity else "default"
    compute_dtype = jnp.float32 if fidelity else jnp.bfloat16

    cfg = LossConfig()  # reference defaults
    spec = select_model("vgg19", "max")
    params = init_params(spec, seed=0)

    rng = np.random.default_rng(0)
    content = rng.random((1, size, size, 3), np.float32) * 255 - 128
    style = rng.random((1, size, size, 3), np.float32) * 255 - 128

    def fresh_init() -> np.ndarray:
        # EVERY timed call gets a distinct init: the device tunnel memoizes
        # repeated executions with identical input buffers, which inflates
        # the rate ~2x (observed 64 vs a real 34 MP-it/s)
        return rng.standard_normal((1, size, size, 3)).astype(np.float32) * 0.001

    def _note(msg: str) -> None:
        # stderr breadcrumbs with elapsed time: a killed run's tail then
        # shows WHERE the budget went (VERDICT r4: BENCH_r04 died opaque)
        print(f"[bench +{time.monotonic() - t_start:.0f}s] {msg}", file=sys.stderr, flush=True)

    def measure(optimizer: str) -> float:
        _note(f"image/{optimizer}: building engine")
        engine = StyleEngine(
            spec,
            params,
            cfg,
            optimizer=optimizer,
            learning_rate=1.0,
            precision=precision,
            compute_dtype=compute_dtype,
        )
        # warmup-compile both scan lengths, then measure the marginal
        # per-iteration rate as a slope: (t(2n) - t(n)) / n.  This cancels
        # the fixed per-call costs (target capture, host<->device transfer
        # over the chip tunnel) that don't scale with iterations.  Use the
        # MEDIAN of the slopes: noise is one-sided (contention only slows a
        # call), but a slow t_n SHRINKS the difference and inflates the
        # rate, so min/max-picking selects contaminated trials either way.
        engine.optimize(content, [style], fresh_init(), iters_timed, blend_weights=[1.0])
        _note(f"image/{optimizer}: warmup n done")
        engine.optimize(content, [style], fresh_init(), 2 * iters_timed, blend_weights=[1.0])
        _note(f"image/{optimizer}: warmup 2n done, timing")

        rates = []
        for _ in range(3):
            start = time.perf_counter()
            engine.optimize(content, [style], fresh_init(), iters_timed, blend_weights=[1.0])
            t_n = time.perf_counter() - start
            start = time.perf_counter()
            engine.optimize(content, [style], fresh_init(), 2 * iters_timed, blend_weights=[1.0])
            t_2n = time.perf_counter() - start
            megapixels = size * size / 1e6
            rates.append(megapixels * iters_timed / max(t_2n - t_n, 1e-9))
        _check_finite(f"image/{optimizer}", engine.last_loss_log)
        return float(np.median(rates))

    def robust(optimizer: str) -> float:
        # the axon tunnel sporadically aborts valid runs with a bare
        # INVALID_ARGUMENT; retry a couple of times before giving up
        for attempt in range(3):
            try:
                return measure(optimizer)
            except FloatingPointError:
                raise  # a NaN loss is a bug, not tunnel noise
            except Exception as e:
                if attempt == 2:
                    raise
                print(f"bench {optimizer} attempt {attempt} failed ({e}); retrying", file=sys.stderr)
        return 0.0

    result: dict = {
        "metric": "megapixel_iters_per_sec_per_chip_1024_gram",
        "value": None,
        "unit": "MP-iters/s/chip",
        "config": {
            "size": size,
            "compute_dtype": str(np.dtype("float32") if fidelity else "bfloat16"),
            "precision": precision,
            "optimizers": ["lbfgs", "adam"],
        },
        "budget_s": budget_s,
    }
    skipped: list[str] = []

    def emit() -> None:
        out = dict(result)
        if skipped:
            out["skipped_after_budget"] = list(skipped)
        out["elapsed_s"] = round(time.monotonic() - t_start, 1)
        print(json.dumps(out), flush=True)

    def remaining() -> float:
        return budget_s - (time.monotonic() - t_start)

    # a parseable line exists from the very start: on a wedged tunnel hour
    # (observed: single executable loads taking 10+ min) the driver's
    # timeout then finds a structured record with elapsed time instead of
    # an empty artifact (BENCH_r04's failure mode)
    result["note"] = "headline in progress"
    emit()
    del result["note"]

    # headline first: the adam rate is the artifact's `value`; a line exists
    # as soon as it lands, and every later stage only improves the record
    adam_rate = robust("adam")
    _check_finite("image/adam rate", adam_rate)
    result["value"] = round(adam_rate, 3)
    result["vs_baseline"] = round(adam_rate / REFERENCE_BASELINE_MP_ITERS_PER_SEC, 3)
    emit()

    # the reference's default optimizer (lbfgs, config.py:47)
    lbfgs_rate = robust("lbfgs")
    _check_finite("image/lbfgs rate", lbfgs_rate)
    result["lbfgs_value"] = round(lbfgs_rate, 3)
    result["lbfgs_vs_baseline"] = round(lbfgs_rate / REFERENCE_BASELINE_MP_ITERS_PER_SEC, 3)
    emit()

    def stage_video() -> None:
        vfpm = measure_video_frames_per_min()
        _check_finite("video rate", vfpm)
        result["video_frames_per_min"] = round(vfpm, 2)
        result["video_vs_baseline"] = round(vfpm / REFERENCE_BASELINE_VIDEO_FRAMES_PER_MIN, 3)

    def stage_img_vid() -> None:
        result.update(measure_img_vid_mp_iters())

    def stage_nca() -> None:
        # nca_train itself raises on a non-finite chunk loss
        result["nca_steps_per_sec"] = round(measure_nca_steps_per_sec(), 2)

    def stage_clip() -> None:
        result.update(measure_clip_startup_s())

    # (name, conservative worst-case cost estimate, runs-by-default, fn).
    # Estimates are slow-chip-day ceilings (PERF.md round-4 battery timings);
    # a stage that no longer fits the remaining budget is recorded as
    # skipped, never silently dropped.
    stages = [
        ("video", 540.0, "--no-video" not in sys.argv, stage_video),
        ("img_vid", 300.0, "--no-img-vid" not in sys.argv, stage_img_vid),
        ("nca", 300.0, "--no-nca" not in sys.argv, stage_nca),
        # CLIP cold-start is two ~7-min subprocesses through the tunnel:
        # opt-in only (VERDICT r4 #1c); the standing record is in PERF.md
        ("clip", 1000.0, "--clip" in sys.argv, stage_clip),
    ]
    for stage_name, est_s, enabled, fn in stages:
        if not enabled:
            continue
        if remaining() < est_s:
            _note(f"stage {stage_name}: skipped ({remaining():.0f}s left < {est_s:.0f}s estimate)")
            skipped.append(stage_name)
            emit()
            continue
        _note(f"stage {stage_name}: starting")
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — stage isolation (in-process errors only)
            result[f"{stage_name}_error"] = f"{type(e).__name__}: {e}"[:200]
        emit()
    return result


if __name__ == "__main__":
    main()
