from vec_vad_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    data_sharding,
    replicated_sharding,
    pad_to_multiple,
)
