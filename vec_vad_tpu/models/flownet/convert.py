"""torch checkpoint -> flax parameter conversion for the FlowNet2 family.

The reference loads FlowNet2_checkpoint.pth.tar with a partial state-dict
merge (calc_optical_flow.py:15-21). This converter maps that state dict's
keys onto our flax trees:

  torch key pattern                  flax path                transform
  <m>.<conv>.0.weight                <m>/<conv>/conv/kernel   OIHW->HWIO
  <m>.<conv>.0.bias                  <m>/<conv>/conv/bias     copy
  <m>.<conv>.1.{weight,bias}         <m>/<conv>/bn/...        BN affine
  <m>.<conv>.1.running_{mean,var}    batch_stats              copy
  <m>.deconv*.0.weight               <m>/deconv*/conv/kernel  IOHW->HWIO
  <m>.predict_flow*.{weight,bias}    bare conv                OIHW->HWIO
  <m>.upsampled_flow*.{weight,bias}  bare convT               IOHW->HWIO

Accepts numpy-valued dicts (call `torch_state_dict_to_numpy` on a torch
state dict first, so the converter itself has no torch dependency).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def torch_state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in state_dict.items()}


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _convT_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 0, 1))  # (I, O, kh, kw) -> (kh, kw, I, O)


def convert_params(
    flax_variables: Dict[str, Any],
    torch_sd: Dict[str, np.ndarray],
    strict: bool = True,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Fill a flax variables dict ({'params': ..., 'batch_stats': ...}) from
    a numpy torch state dict. Returns (variables, report) where report lists
    matched/missing keys (the reference merges partially, so missing torch
    keys keep the flax init unless strict)."""
    import copy

    variables = copy.deepcopy(
        {k: v for k, v in flax_variables.items()}
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    matched, missing = [], []

    def visit(tree, stats_tree, path):
        if not isinstance(tree, dict):
            return
        keys = list(tree.keys())
        if "kernel" in keys:
            _fill_leaf(tree, stats_tree, path)
            return
        for k in keys:
            visit(
                tree[k],
                stats_tree.get(k, {}) if isinstance(stats_tree, dict) else {},
                path + [k],
            )

    def _fill_leaf(leaf, stats_leaf, path):
        # path like [flownetc, conv1, conv] or [flownetc, predict_flow6]
        if path[-1] == "conv" and len(path) >= 2:
            mod_path = path[:-1]
            name = mod_path[-1]
            prefix = ".".join(mod_path)
            if name.startswith("deconv"):
                tkey = prefix + ".0"
                tf = _convT_w
            else:
                tkey = prefix + ".0"
                tf = _conv_w
        else:
            name = path[-1]
            prefix = ".".join(path)
            tkey = prefix
            tf = _convT_w if name.startswith("upsampled_flow") else _conv_w
        wk, bk = tkey + ".weight", tkey + ".bias"
        if wk in torch_sd:
            leaf["kernel"] = np.asarray(tf(torch_sd[wk]), np.float32)
            matched.append(wk)
            if "bias" in leaf and bk in torch_sd:
                leaf["bias"] = np.asarray(torch_sd[bk], np.float32)
                matched.append(bk)
        else:
            missing.append(wk)
            if strict:
                raise KeyError(f"missing torch key {wk}")

    def _fill_bn(tree, stats_tree, path):
        # BN affine lives under params[...]['bn'], stats under batch_stats
        if not isinstance(tree, dict):
            return
        for k, v in tree.items():
            p = path + [k]
            if k == "bn" and isinstance(v, dict) and "scale" in v:
                # module path without the trailing 'bn'
                prefix = ".".join(p[:-1]) + ".1"
                if prefix + ".weight" in torch_sd:
                    v["scale"] = np.asarray(torch_sd[prefix + ".weight"], np.float32)
                    v["bias"] = np.asarray(torch_sd[prefix + ".bias"], np.float32)
                    st = stats_tree
                    for part in p[:-1]:
                        st = st.setdefault(part, {})
                    st = st.setdefault("bn", {})
                    st["mean"] = np.asarray(
                        torch_sd[prefix + ".running_mean"], np.float32
                    )
                    st["var"] = np.asarray(
                        torch_sd[prefix + ".running_var"], np.float32
                    )
                    matched.append(prefix + ".weight")
            elif isinstance(v, dict):
                _fill_bn(v, stats_tree, p)

    visit(params, batch_stats, [])
    _fill_bn(params, batch_stats, [])
    variables["params"] = params
    if batch_stats:
        variables["batch_stats"] = batch_stats
    report = {"matched": matched, "missing": missing}
    return variables, report


def load_flownet2_checkpoint(net, example_input, checkpoint_path: str):
    """Init the flax net and overwrite with a torch .pth(.tar) checkpoint
    (partial merge like calc_optical_flow.py:16-21)."""
    import jax
    import torch

    blob = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    sd = blob["state_dict"] if "state_dict" in blob else blob
    sd = torch_state_dict_to_numpy(sd)
    variables = net.init(jax.random.key(0), example_input, False)
    variables, report = convert_params(dict(variables), sd, strict=False)
    return variables, report
