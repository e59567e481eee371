from vec_vad_tpu.models.flownet.nets import (  # noqa: F401
    FlowNetC,
    FlowNetS,
    FlowNetSD,
    FlowNetFusion,
)
from vec_vad_tpu.models.flownet.flownet2 import (  # noqa: F401
    FlowNet2,
    FlowNet2C,
    FlowNet2S,
    FlowNet2SD,
    FlowNet2CS,
    FlowNet2CSS,
)
from vec_vad_tpu.models.flownet.ops import (  # noqa: F401
    correlation_ref,
    correlation_pallas,
    warp_bilinear,
    channel_norm,
    upsample_bilinear,
    upsample_nearest,
)
from vec_vad_tpu.models.flownet.convert import (  # noqa: F401
    convert_params,
    load_flownet2_checkpoint,
    torch_state_dict_to_numpy,
)
