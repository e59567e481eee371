from vec_vad_tpu.runtime.artifacts import (  # noqa: F401
    save_vad_model,
    load_vad_model,
    ArtifactCache,
    save_pytree_npz,
    load_pytree_npz,
)
