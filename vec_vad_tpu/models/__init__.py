from vec_vad_tpu.models.completion import (  # noqa: F401
    SelfCompletionNet,
    make_completion_net,
)
