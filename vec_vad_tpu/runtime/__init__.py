from vec_vad_tpu.runtime.artifacts import (  # noqa: F401
    save_vad_model,
    load_vad_model,
    ArtifactCache,
    save_pytree_npz,
    load_pytree_npz,
)


def enable_persistent_compile_cache(
    cache_dir: str = "/tmp/vec_vad_tpu_xla_cache",
    min_compile_secs: float = 2.0,
) -> str:
    """Turn on JAX's persistent compilation cache (client-side, so it works
    for remote/relay TPU backends too — the serialized executable is cached
    locally and re-dispatch skips the remote compile entirely). On this
    project's reference backend a cold whole-split FlowNet2+Pallas compile
    measured 979 s; the cache makes that a one-time cost across processes.

    Called by the CLI entry point and bench.py; tests/conftest.py does the
    same for the CPU suite. Set VEC_VAD_TPU_CACHE="" to disable.
    """
    import os

    import jax

    cache_dir = os.environ.get("VEC_VAD_TPU_CACHE", cache_dir)
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
    return cache_dir
