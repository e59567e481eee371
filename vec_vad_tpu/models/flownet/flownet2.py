"""FlowNet2 composite and its released variants.

Graph parity with FlowNet2_src/models/flownet2.py:10-365:
  * joint per-channel mean subtraction over BOTH frames, /255
    (flownet2.py:66-72)
  * FlowNetC -> x20 -> bilinear x4 -> warp img1 -> brightness-error channel
    norm -> 14-ch concat -> FlowNetS1 -> same refinement -> FlowNetS2
  * parallel FlowNetSD branch; FlowNetS2's flow upsampled NEAREST
    (upsample4), FlowNetSD's flow divided by div_flow then NEAREST
    (flownet2.py:105,122)
  * FlowNetFusion merges an 11-channel stack -> final full-res flow

Input layout: (B, 2, H, W, 3) frame-major NHWC (the reference uses
(B, 3, 2, H, W)). Output: (B, H, W, 2).

align_corners: the checkpoint-era torch (<=0.4) upsampled bilinearly with
align_corners=True; modern torch defaults to False. Configurable; True
by default for checkpoint fidelity.
"""

from __future__ import annotations
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from vec_vad_tpu.models.flownet.nets import (
    FlowNetC,
    FlowNetFusion,
    FlowNetS,
    FlowNetSD,
)
from vec_vad_tpu.models.flownet.ops import (
    channel_norm,
    upsample_bilinear,
    upsample_nearest,
    warp_bilinear,
)


def _normalize(inputs: jnp.ndarray, rgb_max: float):
    """(B, 2, H, W, 3) -> mean-subtracted, scaled, channel-concat
    (B, H, W, 6)."""
    mean = jnp.mean(inputs, axis=(1, 2, 3), keepdims=True)
    x = (inputs - mean) / rgb_max
    return jnp.concatenate([x[:, 0], x[:, 1]], axis=-1)


class FlowNet2(nn.Module):
    with_bn: bool = False
    rgb_max: float = 255.0
    div_flow: float = 20.0
    align_corners: bool = True
    use_pallas_correlation: Optional[bool] = None
    interpret_pallas: bool = False

    def setup(self):
        self.flownetc = FlowNetC(
            self.with_bn,
            use_pallas_correlation=self.use_pallas_correlation,
            interpret_pallas=self.interpret_pallas,
        )
        self.flownets_1 = FlowNetS(12, self.with_bn)
        self.flownets_2 = FlowNetS(12, self.with_bn)
        self.flownets_d = FlowNetSD(self.with_bn)
        self.flownetfusion = FlowNetFusion(self.with_bn)

    def __call__(self, inputs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = _normalize(inputs, self.rgb_max)
        img0, img1 = x[..., :3], x[..., 3:]
        ac = self.align_corners

        # FlowNetC stage
        c_flow2 = self.flownetc(x, train)[0]
        c_flow = upsample_bilinear(c_flow2 * self.div_flow, 4, ac)
        warped1 = warp_bilinear(img1, c_flow)
        norm_diff = channel_norm(img0 - warped1)
        concat1 = jnp.concatenate(
            [x, warped1, c_flow / self.div_flow, norm_diff], axis=-1
        )

        # FlowNetS1 stage
        s1_flow2 = self.flownets_1(concat1, train)[0]
        s1_flow = upsample_bilinear(s1_flow2 * self.div_flow, 4, ac)
        warped1 = warp_bilinear(img1, s1_flow)
        norm_diff = channel_norm(img0 - warped1)
        concat2 = jnp.concatenate(
            [x, warped1, s1_flow / self.div_flow, norm_diff], axis=-1
        )

        # FlowNetS2 stage (nearest upsample, flownet2.py:105)
        s2_flow2 = self.flownets_2(concat2, train)[0]
        s2_flow = upsample_nearest(s2_flow2 * self.div_flow, 4)
        norm_s2 = channel_norm(s2_flow)
        warped_s2 = warp_bilinear(img1, s2_flow)
        diff_s2_img1 = channel_norm(img0 - warped_s2)

        # FlowNetSD branch (flow DIVIDED by div_flow, flownet2.py:122)
        sd_flow2 = self.flownets_d(x, train)[0]
        sd_flow = upsample_nearest(sd_flow2 / self.div_flow, 4)
        norm_sd = channel_norm(sd_flow)
        warped_sd = warp_bilinear(img1, sd_flow)
        diff_sd_img1 = channel_norm(img0 - warped_sd)

        concat3 = jnp.concatenate(
            [img0, sd_flow, s2_flow, norm_sd, norm_s2, diff_sd_img1, diff_s2_img1],
            axis=-1,
        )  # 3+2+2+1+1+1+1 = 11 channels
        return self.flownetfusion(concat3, train)


class FlowNet2C(nn.Module):
    with_bn: bool = False
    rgb_max: float = 255.0
    div_flow: float = 20.0
    align_corners: bool = True
    use_pallas_correlation: Optional[bool] = None
    interpret_pallas: bool = False

    def setup(self):
        self.flownetc = FlowNetC(
            self.with_bn,
            use_pallas_correlation=self.use_pallas_correlation,
            interpret_pallas=self.interpret_pallas,
        )

    def __call__(self, inputs, train: bool = False):
        x = _normalize(inputs, self.rgb_max)
        flows = self.flownetc(x, train)
        if train:
            return flows
        return upsample_bilinear(flows[0] * self.div_flow, 4, self.align_corners)


class FlowNet2S(nn.Module):
    with_bn: bool = False
    rgb_max: float = 255.0
    div_flow: float = 20.0
    align_corners: bool = True

    def setup(self):
        self.flownets = FlowNetS(6, self.with_bn)

    def __call__(self, inputs, train: bool = False):
        x = _normalize(inputs, self.rgb_max)
        flows = self.flownets(x, train)
        if train:
            return flows
        return upsample_bilinear(flows[0] * self.div_flow, 4, self.align_corners)


class FlowNet2SD(nn.Module):
    with_bn: bool = False
    rgb_max: float = 255.0
    div_flow: float = 20.0
    align_corners: bool = True

    def setup(self):
        self.flownetsd = FlowNetSD(self.with_bn)

    def __call__(self, inputs, train: bool = False):
        x = _normalize(inputs, self.rgb_max)
        flows = self.flownetsd(x, train)
        if train:
            return flows
        return upsample_bilinear(flows[0] * self.div_flow, 4, self.align_corners)


class FlowNet2CS(nn.Module):
    with_bn: bool = False
    rgb_max: float = 255.0
    div_flow: float = 20.0
    align_corners: bool = True
    use_pallas_correlation: Optional[bool] = None
    interpret_pallas: bool = False

    def setup(self):
        self.flownetc = FlowNetC(
            self.with_bn,
            use_pallas_correlation=self.use_pallas_correlation,
            interpret_pallas=self.interpret_pallas,
        )
        self.flownets_1 = FlowNetS(12, self.with_bn)

    def __call__(self, inputs, train: bool = False):
        x = _normalize(inputs, self.rgb_max)
        img0, img1 = x[..., :3], x[..., 3:]
        ac = self.align_corners
        c_flow = upsample_bilinear(
            self.flownetc(x, train)[0] * self.div_flow, 4, ac
        )
        warped1 = warp_bilinear(img1, c_flow)
        concat1 = jnp.concatenate(
            [x, warped1, c_flow / self.div_flow, channel_norm(img0 - warped1)],
            axis=-1,
        )
        return upsample_bilinear(
            self.flownets_1(concat1, train)[0] * self.div_flow, 4, ac
        )


class FlowNet2CSS(nn.Module):
    with_bn: bool = False
    rgb_max: float = 255.0
    div_flow: float = 20.0
    align_corners: bool = True
    use_pallas_correlation: Optional[bool] = None
    interpret_pallas: bool = False

    def setup(self):
        self.flownetc = FlowNetC(
            self.with_bn,
            use_pallas_correlation=self.use_pallas_correlation,
            interpret_pallas=self.interpret_pallas,
        )
        self.flownets_1 = FlowNetS(12, self.with_bn)
        self.flownets_2 = FlowNetS(12, self.with_bn)

    def __call__(self, inputs, train: bool = False):
        x = _normalize(inputs, self.rgb_max)
        img0, img1 = x[..., :3], x[..., 3:]
        ac = self.align_corners
        c_flow = upsample_bilinear(
            self.flownetc(x, train)[0] * self.div_flow, 4, ac
        )
        warped1 = warp_bilinear(img1, c_flow)
        concat1 = jnp.concatenate(
            [x, warped1, c_flow / self.div_flow, channel_norm(img0 - warped1)],
            axis=-1,
        )
        s1_flow = upsample_bilinear(
            self.flownets_1(concat1, train)[0] * self.div_flow, 4, ac
        )
        warped1 = warp_bilinear(img1, s1_flow)
        concat2 = jnp.concatenate(
            [x, warped1, s1_flow / self.div_flow, channel_norm(img0 - warped1)],
            axis=-1,
        )
        # final upsample is NEAREST in the reference (flownet2.py:310,363)
        return upsample_nearest(
            self.flownets_2(concat2, train)[0] * self.div_flow, 4
        )
