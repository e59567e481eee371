"""The video-event completion model family ("cloze test" networks).

One configurable class covers all three reference architectures
(model/unet.py):
  * SelfCompleteNet4      ("5raw1of",  tot_of_num=1)   unet.py:73-267
  * SelfCompleteNetFull   ("5raw5of",  tot_of_num=5)   unet.py:270-556
  * SelfCompleteNet1raw1of("1raw1of",  raw_range=T-1)  unet.py:559-652

TPU-native redesign: where the reference hand-unrolls one UNet module per
erased position (inc0..inc4, up01..up43, ...), here the erased-position
ensemble is a SINGLE UNet vmapped over stacked parameters (`nn.vmap` with
`variable_axes={'params': 0}`), so the whole ensemble runs as one batched
XLA computation. Each member still gets an independent init (split rngs) and
independent gradients — numerically the same training dynamics as N separate
modules, minus N separate kernel launches.

Semantics preserved exactly:
  * erasure by channel drop when padding=False (unet.py:183) or zero-fill
    when padding=True (unet.py:180-182)
  * rawRange restriction of trained positions (unet.py:84-90)
  * flow head fires at position k iff 0 <= k - raw_of_offset < tot_of_num
    (unet.py:247-259)
  * predict/elastic center-index arithmetic (unet.py:78-83)

Layout: NHWC. Cube inputs are (B, P, P, T*3) raw / (B, P, P, T_of*2) flow,
channel-stacked T-major exactly like the reference's reshape
(vad_datasets.py:148-166).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from vec_vad_tpu.config import CompletionConfig
from vec_vad_tpu.models.layers import UNet


@dataclass(frozen=True)
class CompletionOutput:
    """Stacked ensemble outputs.

    raw_out/raw_tgt: (E, B, P, P, 3) — one slab per trained erased position.
    of_out/of_tgt: (F, B, P, P, 2) or None — one slab per firing flow head.
    Sums over (E/F, P, P, C) reproduce the reference's channel-concatenated
    MSE sums exactly (order of concatenation is irrelevant under summation).
    """

    raw_out: jnp.ndarray
    raw_tgt: jnp.ndarray
    of_out: Optional[jnp.ndarray]
    of_tgt: Optional[jnp.ndarray]


def _erase(x: jnp.ndarray, k: int, ch: int, padding: bool) -> jnp.ndarray:
    """Remove frame k from a channel-stacked input (unet.py:180-183)."""
    if padding:
        return x.at[..., k * ch : (k + 1) * ch].set(0.0)
    return jnp.concatenate(
        [x[..., : k * ch], x[..., (k + 1) * ch :]], axis=-1
    )


class SelfCompletionNet(nn.Module):
    """Erased-position completion ensemble (see module docstring)."""

    features_root: int = 32
    tot_raw_num: int = 5
    tot_of_num: int = 1
    border_mode: str = "predict"
    raw_range: Optional[int] = None  # None -> every position
    use_flow: bool = True
    padding: bool = False
    raw_channels: int = 3
    of_channels: int = 2

    @property
    def raw_positions(self) -> List[int]:
        if self.raw_range is None:
            return list(range(self.tot_raw_num))
        r = self.raw_range
        if r < 0:
            r += self.tot_raw_num
        assert 0 <= r < self.tot_raw_num
        return [r]

    @property
    def raw_of_offset(self) -> int:
        if self.border_mode in ("predict", "elasticPredict"):
            return (self.tot_raw_num - 1) - (self.tot_of_num - 1)
        return (self.tot_raw_num - 1) // 2 - (self.tot_of_num - 1) // 2

    @property
    def flow_positions(self) -> List[Tuple[int, int]]:
        """(raw position k, flow slot of_i) pairs where the flow head fires."""
        return [
            (k, k - self.raw_of_offset)
            for k in self.raw_positions
            if 0 <= k - self.raw_of_offset < self.tot_of_num
        ]

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_of: Optional[jnp.ndarray],
        train: bool,
        batch_weight: Optional[jnp.ndarray] = None,
    ) -> CompletionOutput:
        """batch_weight: optional (B,) 0/1 pad mask making BatchNorm batch
        statistics ignore wrap-padded rows (reference partial-batch parity;
        see models.layers.BatchNorm)."""
        ch = self.raw_channels
        positions = self.raw_positions
        erased = jnp.stack(
            [_erase(x, k, ch, self.padding) for k in positions], axis=0
        )  # (E, B, P, P, C_in)
        raw_tgt = jnp.stack(
            [x[..., k * ch : (k + 1) * ch] for k in positions], axis=0
        )

        ensemble = nn.vmap(
            UNet,
            in_axes=(0, None, None),
            out_axes=0,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True},
        )
        raw_out = ensemble(self.features_root, ch, name="raw_unets")(
            erased, train, batch_weight
        )

        of_out = of_tgt = None
        if self.use_flow:
            fpos = self.flow_positions
            if fpos:
                och = self.of_channels
                # The reference shares ONE flow UNet when tot_of_num == 1
                # (unet.py:161-170) and uses one per slot otherwise
                # (unet.py:360-408); either way each firing (position, slot)
                # pair is an independent member here, which is equivalent
                # because a slot fires from at most one position.
                pos_idx = [positions.index(k) for k, _ in fpos]
                flow_in = erased[jnp.array(pos_idx)]
                flow_ens = nn.vmap(
                    UNet,
                    in_axes=(0, None, None),
                    out_axes=0,
                    variable_axes={"params": 0, "batch_stats": 0},
                    split_rngs={"params": True},
                )
                of_out = flow_ens(self.features_root, och, name="of_unets")(
                    flow_in, train, batch_weight
                )
                assert x_of is not None, "use_flow=True requires x_of"
                of_tgt = jnp.stack(
                    [
                        x_of[..., of_i * och : (of_i + 1) * och]
                        for _, of_i in fpos
                    ],
                    axis=0,
                )
        return CompletionOutput(raw_out, raw_tgt, of_out, of_tgt)


def make_completion_net(cfg: CompletionConfig) -> SelfCompletionNet:
    """Build the net the reference would select for this config
    (train.py:260-268: tot_of_num==1 -> Net4, ==5 -> NetFull)."""
    return SelfCompletionNet(
        features_root=cfg.nf,
        tot_raw_num=cfg.tot_raw_num,
        tot_of_num=cfg.tot_of_num,
        border_mode=cfg.border_mode,
        raw_range=cfg.resolved_raw_range,
        use_flow=cfg.use_flow,
        padding=cfg.padding,
    )
