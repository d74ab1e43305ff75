"""maua_style_tpu — a TPU-native (JAX/XLA/Pallas/pjit) neural style framework.

A ground-up rebuild of the capabilities of JCBrouwer/maua-style (multi-resolution
neural style transfer for images and video, optical-flow temporal coherence,
CLIP+VQGAN guided synthesis, neural cellular automata textures) designed for TPU:

- feature extraction + losses + optimizer updates compile to a single XLA program
  executed as a ``lax.scan`` on device (no per-iteration host sync),
- parallelism is expressed as GSPMD shardings over a ``jax.sharding.Mesh``
  (spatial sharding of convolutions, frame-parallel video batches, psum'd Gram
  accumulation) instead of explicit device placement,
- hot ops (fused Gram+MSE, cost-volume correlation for optical flow) have
  Pallas TPU kernels.

Array convention: images/videos are float32 NHWC, BGR channel order with the
Caffe mean ([103.939, 116.779, 123.68]) subtracted — the same numeric space the
reference operates in (reference: load.py:21-32), but laid out channel-last for
TPU.
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persist XLA executables across processes.

    Every (shape, config) pair is a fresh XLA compile — minutes for the big
    graphs (VQGAN+CLIP) on a tunneled TPU.  The persistent cache makes reruns
    and artifact-resume restarts start in seconds instead.
    """
    import os

    try:
        import jax

        cache_dir = os.environ.get(
            "MAUA_XLA_CACHE", os.path.expanduser("~/.cache/maua_style_tpu/xla")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # cache is an optimisation; never fail import over it
        pass


_enable_compilation_cache()
