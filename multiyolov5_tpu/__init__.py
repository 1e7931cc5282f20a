"""multiyolov5_tpu — TPU-native joint detection + segmentation framework."""

import os


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache (optional, on by default).

    The fused inference/train graphs take minutes to compile cold on a
    tunneled TPU; warm starts finish in seconds.  The TPU analog of the
    reference's cudnn.benchmark autotune-cache policy (detect.py:115-124).
    Opt out with MULTIYOLOV5_NO_COMPILE_CACHE=1 or redirect via
    JAX_CACHE_DIR.
    """
    if os.environ.get("MULTIYOLOV5_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        # Respect an embedding application's own setting (advisor round 1):
        # only configure the cache dir when nothing has configured one yet.
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir",
                              os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compile_cache()
