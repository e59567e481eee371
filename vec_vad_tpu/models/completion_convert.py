"""Import reference torch checkpoints of the completion nets.

The reference persists `model_set` — a (scene)/h/w grid of torch
state_dicts of SelfCompleteNet4/Full/1raw1of wrapped in DataParallel
('module.' key prefix) — via torch.save (train.py:331,410,436) and its
released checkpoints (README.md:63) use the same format. This converter
maps those keys onto our stacked-ensemble parameter tree so released
weights reproduce scores in this framework.

Key layout per raw position k (model/unet.py:110-158):
  inc{k}.conv.conv.{0,3}       two 3x3 convs    -> DoubleConv_0/Conv_{0,1}
  inc{k}.conv.conv.{1,4}       two BNs          -> DoubleConv_0/BatchNorm_{0,1}
  down{k}j.mpconv.1.conv.*     j=1..3           -> DoubleConv_j
  up{k}j.up                    convT k3 s2      -> ConvTranspose2x_{j-1}
  up{k}j.conv.conv.*                            -> DoubleConv_{3+j}
  outc{k}.conv                 1x1              -> out_kernel/out_bias
Flow UNets use inc_of / inc_of{i} etc. (unet.py:161-170,360-408).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from vec_vad_tpu.models.completion import SelfCompletionNet


def _conv_w(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def _convT_w(w):
    return np.transpose(np.asarray(w), (2, 3, 0, 1))  # (I,O,kh,kw) -> HWIO


def _strip_module(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {
        (k[len("module.") :] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


def _double_conv(sd, prefix):
    """torch double_conv Sequential -> our DoubleConv params+stats."""
    params = {}
    stats = {}
    for ci, bi, cn, bn in ((0, 1, "Conv_0", "BatchNorm_0"), (3, 4, "Conv_1", "BatchNorm_1")):
        params[cn] = {
            "kernel": _conv_w(sd[f"{prefix}.{ci}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.{ci}.bias"]),
        }
        params[bn] = {
            "scale": np.asarray(sd[f"{prefix}.{bi}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.{bi}.bias"]),
        }
        stats[bn] = {
            "mean": np.asarray(sd[f"{prefix}.{bi}.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.{bi}.running_var"]),
        }
    return params, stats


def _unet_from_torch(sd, inc, downs, ups, outc):
    """Assemble one UNet's (params, batch_stats) from torch module names."""
    params: Dict = {}
    stats: Dict = {}
    p, s = _double_conv(sd, f"{inc}.conv.conv")
    params["DoubleConv_0"], stats["DoubleConv_0"] = p, s
    for j, d in enumerate(downs, start=1):
        p, s = _double_conv(sd, f"{d}.mpconv.1.conv")
        params[f"DoubleConv_{j}"], stats[f"DoubleConv_{j}"] = p, s
    for j, u in enumerate(ups):
        params[f"ConvTranspose2x_{j}"] = {
            "kernel": _convT_w(sd[f"{u}.up.weight"]),
            "bias": np.asarray(sd[f"{u}.up.bias"]),
        }
        p, s = _double_conv(sd, f"{u}.conv.conv")
        params[f"DoubleConv_{4 + j}"], stats[f"DoubleConv_{4 + j}"] = p, s
    params["out_kernel"] = _conv_w(sd[f"{outc}.conv.weight"])
    params["out_bias"] = np.asarray(sd[f"{outc}.conv.bias"])
    return params, stats


def _stack(trees: List[Dict]) -> Dict:
    """Stack a list of identical pytrees along a new leading axis."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *trees)


def convert_completion_state_dict(
    sd: Dict[str, np.ndarray], net: SelfCompletionNet
) -> Dict[str, Dict]:
    """torch state dict (numpy values) -> flax variables for `net`."""
    sd = _strip_module(sd)
    raw_p, raw_s = [], []
    for k in net.raw_positions:
        p, s = _unet_from_torch(
            sd,
            f"inc{k}",
            [f"down{k}{j}" for j in (1, 2, 3)],
            [f"up{k}{j}" for j in (1, 2, 3)],
            f"outc{k}",
        )
        raw_p.append(p)
        raw_s.append(s)
    params = {"raw_unets": _stack(raw_p)}
    stats = {"raw_unets": _stack(raw_s)}

    if net.use_flow and net.flow_positions:
        of_p, of_s = [], []
        shared = "inc_of.conv.conv.0.weight" in sd  # Net4's single flow UNet
        for _, of_i in net.flow_positions:
            suffix = "" if shared else str(of_i)
            p, s = _unet_from_torch(
                sd,
                f"inc_of{suffix}",
                [f"down_of{suffix}{j}" for j in (1, 2, 3)],
                [f"up_of{suffix}{j}" for j in (1, 2, 3)],
                f"outc_of{suffix}",
            )
            of_p.append(p)
            of_s.append(s)
        params["of_unets"] = _stack(of_p)
        stats["of_unets"] = _stack(of_s)
    return {"params": params, "batch_stats": stats}


def load_reference_model_grid(
    path: str, net: SelfCompletionNet
) -> List[Tuple[Tuple[int, ...], Dict]]:
    """Load a reference model_set file (torch.save of the nested grid,
    train.py:436) -> [(grid_key, flax variables), ...]."""
    import torch

    model_set = torch.load(path, map_location="cpu", weights_only=False)

    out = []

    def to_numpy(sd):
        return {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()}

    def walk(node, key):
        if isinstance(node, list):
            if node and isinstance(node[0], dict):  # [state_dict]
                out.append((key, convert_completion_state_dict(to_numpy(node[0]), net)))
            else:
                for i, child in enumerate(node):
                    walk(child, key + (i,))

    walk(model_set, ())
    return out


def import_model_grid(cfg, model_dir: str, *, mode: str = None, method: str = None):
    """Load the reference's released artifact set into a VadModel.

    Inverse of `completion_export.export_model_grid`: consumes the three
    torch.save files test.py:229-267 reads — `<ds>_model_<mode>_<method>.npy`
    (nested grid of [state_dict]) plus the raw/of training-score grids that
    carry the z-normalization statistics — and returns a VadModel ready for
    `runner.run_test` / `save_vad_model`. The released checkpoints
    (README.md:63, e.g. avenue_model_5raw1of_auc0.902) ship exactly this
    set.
    """
    import os

    import torch

    from vec_vad_tpu.models.completion import make_completion_net
    from vec_vad_tpu.pipeline import VadModel
    from vec_vad_tpu.train.trainer import TrainedBlock

    mode = mode or cfg.fore.extraction_mode
    method = method or cfg.method

    def path(tag: str) -> str:
        return os.path.join(
            model_dir, f"{cfg.dataset_name}_{tag}_{mode}_{method}.npy"
        )

    net = make_completion_net(cfg.model)
    grid = load_reference_model_grid(path("model"), net)
    if not grid:
        raise ValueError(f"{path('model')}: no trained blocks in model_set")
    raw_set = torch.load(
        path("raw_training_scores"), map_location="cpu", weights_only=False
    )
    of_set = None
    if cfg.model.use_flow and os.path.exists(path("of_training_scores")):
        of_set = torch.load(
            path("of_training_scores"), map_location="cpu", weights_only=False
        )

    def leaf(node, key):
        for i in key:
            node = node[i]
        return node

    blocks = {}
    for key, variables in grid:
        # single-scene grids are [h][w]; SHT-style are [scene][h][w]
        k3 = key if len(key) == 3 else (0,) + tuple(key)
        raw_scores = np.asarray(leaf(raw_set, key), np.float32)
        of_scores = None
        if of_set is not None:
            v = leaf(of_set, key)
            if not (isinstance(v, list) and len(v) == 0):
                of_scores = np.asarray(v, np.float32)
        blocks[k3] = TrainedBlock(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            raw_scores=raw_scores,
            of_scores=of_scores,
        )
    return VadModel(cfg=cfg, blocks=blocks)
