"""Export trained completion models to the reference's torch artifacts.

The exact inverse of `completion_convert`: a trained `VadModel` exports to
the three torch.save artifacts the reference's test.py consumes
(test.py:230-266, written by train.py:432-436):

  <ds>_model_<mode>_<method>.npy                 nested (scene/)h/w grid,
                                                 each trained cell a
                                                 [state_dict] with the
                                                 DataParallel 'module.'
                                                 key prefix
  <ds>_raw_training_scores_<mode>_<method>.npy   nested grids of per-cube
  <ds>_of_training_scores_<mode>_<method>.npy    training-score arrays
                                                 (1-D float, [] untrained)

so a model trained on TPU in this framework can be scored/inspected by
the unmodified reference code path (interop in BOTH directions —
`completion_convert.load_reference_model_grid` is torch -> here).

Key layout mirrors model/unet.py module names (see completion_convert's
docstring); `num_batches_tracked` is emitted as 0 — torch only consults
it when BN momentum is None, and both frameworks train with the default
momentum (models/layers.py parity note).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from vec_vad_tpu.models.completion import SelfCompletionNet


def _conv_w(w):
    return np.transpose(np.asarray(w), (3, 2, 0, 1))  # HWIO -> OIHW


def _convT_w(w):
    return np.transpose(np.asarray(w), (2, 3, 0, 1))  # (kh,kw,I,O) -> (I,O,kh,kw)


def _take(tree, i: int):
    """i-th slice of every leaf of a stacked-ensemble subtree."""
    import jax

    return jax.tree.map(lambda x: np.asarray(x[i]), tree)


def _emit_double_conv(sd, prefix: str, params: Dict, stats: Dict) -> None:
    import torch

    for ci, bi, cn, bn in (
        (0, 1, "Conv_0", "BatchNorm_0"),
        (3, 4, "Conv_1", "BatchNorm_1"),
    ):
        sd[f"{prefix}.{ci}.weight"] = _conv_w(params[cn]["kernel"])
        sd[f"{prefix}.{ci}.bias"] = np.asarray(params[cn]["bias"])
        sd[f"{prefix}.{bi}.weight"] = np.asarray(params[bn]["scale"])
        sd[f"{prefix}.{bi}.bias"] = np.asarray(params[bn]["bias"])
        sd[f"{prefix}.{bi}.running_mean"] = np.asarray(stats[bn]["mean"])
        sd[f"{prefix}.{bi}.running_var"] = np.asarray(stats[bn]["var"])
        sd[f"{prefix}.{bi}.num_batches_tracked"] = torch.tensor(
            0, dtype=torch.int64
        )


def _emit_unet(sd, params: Dict, stats: Dict, inc, downs, ups, outc) -> None:
    _emit_double_conv(sd, f"{inc}.conv.conv", params["DoubleConv_0"],
                      stats["DoubleConv_0"])
    for j, d in enumerate(downs, start=1):
        _emit_double_conv(sd, f"{d}.mpconv.1.conv", params[f"DoubleConv_{j}"],
                          stats[f"DoubleConv_{j}"])
    for j, u in enumerate(ups):
        sd[f"{u}.up.weight"] = _convT_w(params[f"ConvTranspose2x_{j}"]["kernel"])
        sd[f"{u}.up.bias"] = np.asarray(params[f"ConvTranspose2x_{j}"]["bias"])
        _emit_double_conv(sd, f"{u}.conv.conv", params[f"DoubleConv_{4 + j}"],
                          stats[f"DoubleConv_{4 + j}"])
    sd[f"{outc}.conv.weight"] = _conv_w(params["out_kernel"])
    sd[f"{outc}.conv.bias"] = np.asarray(params["out_bias"])


def export_completion_state_dict(variables: Dict, net: SelfCompletionNet):
    """flax variables for `net` -> torch state_dict in the reference's
    DataParallel-wrapped layout ('module.' prefix), loadable with
    strict=True into SelfCompleteNet4/Full (model/unet.py)."""
    import torch

    params, stats = variables["params"], variables["batch_stats"]
    sd: Dict[str, np.ndarray] = {}
    for i, k in enumerate(net.raw_positions):
        _emit_unet(
            sd,
            _take(params["raw_unets"], i),
            _take(stats["raw_unets"], i),
            f"inc{k}",
            [f"down{k}{j}" for j in (1, 2, 3)],
            [f"up{k}{j}" for j in (1, 2, 3)],
            f"outc{k}",
        )
    if net.use_flow and "of_unets" in params:
        # Net4's single flow UNet has unindexed names (unet.py:161-170);
        # Full's five carry their of_i index (unet.py:360-408)
        shared = net.tot_of_num == 1
        for i, (_, of_i) in enumerate(net.flow_positions):
            suffix = "" if shared else str(of_i)
            _emit_unet(
                sd,
                _take(params["of_unets"], i),
                _take(stats["of_unets"], i),
                f"inc_of{suffix}",
                [f"down_of{suffix}{j}" for j in (1, 2, 3)],
                [f"up_of{suffix}{j}" for j in (1, 2, 3)],
                f"outc_of{suffix}",
            )
    return {
        f"module.{k}": (
            v if isinstance(v, torch.Tensor)
            else torch.from_numpy(np.array(v))  # copy: jax exports are read-only
        )
        for k, v in sd.items()
    }


def export_model_grid(
    model,
    out_dir: str,
    *,
    mode: str = "obj_det_with_motion",
    method: str = "SelfComplete",
) -> List[str]:
    """Write a VadModel as the reference's three torch.save artifacts
    (train.py:432-436 naming) under `out_dir`; returns the paths.

    Grid nesting follows the reference's convention: [scene][h][w] when
    the dataset is multi-scene (test.py:231 keys the extra level on
    ShanghaiTech, the only scene_num>1 dataset), else [h][w]. Untrained
    cells are [] exactly like the reference leaves them."""
    import torch

    from vec_vad_tpu.models.completion import make_completion_net

    cfg = model.cfg
    net = make_completion_net(cfg.model)
    hb, wb = cfg.fore.h_block, cfg.fore.w_block
    scenes = max(
        cfg.dataset.scene_num, max((k[0] for k in model.blocks), default=0) + 1
    )
    # the reference keys the extra grid level on the dataset NAME, not a
    # scene count (test.py:231 branches on 'ShanghaiTech'; its frame_size
    # table carries scene_num=1 even for SHT)
    multi_scene = cfg.dataset.scene_num > 1 or cfg.dataset_name == "ShanghaiTech"

    def grid(fill):
        g = [
            [[fill() for _ in range(wb)] for _ in range(hb)]
            for _ in range(scenes)
        ]
        return g if multi_scene else g[0]

    def cell(g, key):
        s, h, w = key
        if multi_scene:
            node = g[s]
        elif s != 0:
            raise ValueError(
                f"scene {s + 1} block in a single-scene dataset grid"
            )
        else:
            node = g
        if h >= hb or w >= wb:
            raise ValueError(f"block key {key} outside {scenes}x{hb}x{wb}")
        return node[h], w

    model_set = grid(list)
    raw_scores = grid(list)
    of_scores = grid(list)
    use_flow = bool(cfg.model.use_flow)
    for key, blk in sorted(model.blocks.items()):
        sd = export_completion_state_dict(
            {"params": blk.params, "batch_stats": blk.batch_stats}, net
        )
        row, w = cell(model_set, key)
        row[w] = [sd]
        row, w = cell(raw_scores, key)
        row[w] = np.asarray(blk.raw_scores, np.float32)
        if use_flow and blk.of_scores is not None:
            row, w = cell(of_scores, key)
            row[w] = np.asarray(blk.of_scores, np.float32)

    os.makedirs(out_dir, exist_ok=True)
    name = cfg.dataset_name
    paths = []
    for tag, obj in (
        ("model", model_set),
        ("raw_training_scores", raw_scores),
        ("of_training_scores", of_scores),
    ):
        p = os.path.join(out_dir, f"{name}_{tag}_{mode}_{method}.npy")
        torch.save(obj, p)
        paths.append(p)
    return paths
