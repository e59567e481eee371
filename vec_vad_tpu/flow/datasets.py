"""Optical-flow training datasets.

Capability parity with FlowNet2_src/datasets.py (MpiSintel, FlyingChairs,
ChairsSDHom loaders for the flow fine-tuning harness): each dataset yields
(image-pair (2, H, W, 3) uint8, flow (H, W, 2) float32) samples and a
`batches()` iterator feeding flow.trainer.FlowTrainer.

Layouts (the public dataset conventions the reference consumes):
  MPI-Sintel:     <root>/<dstype>/<scene>/frame_%04d.png
                  <root>/flow/<scene>/frame_%04d.flo
  FlyingChairs:   <root>/*-img_0.ppm, *-img_1.ppm, *-flow.flo
                  (also the 05d_img1/img2/flow naming variant)
  ChairsSDHom:    <root>/<train|test>/t0/*.png, t1/*.png, flow/*.flo
"""

from __future__ import annotations

import glob
import os
from typing import Iterator, List, Tuple

import numpy as np

from vec_vad_tpu.utils.flowviz import read_flo


def _imread(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return img


class PairFlowDataset:
    """Base: parallel lists of (img0, img1, flow) file triples."""

    def __init__(self, triples: List[Tuple[str, str, str]]):
        if not triples:
            raise FileNotFoundError("no samples found")
        self.triples = triples

    def __len__(self) -> int:
        return len(self.triples)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        p0, p1, pf = self.triples[i]
        pair = np.stack([_imread(p0), _imread(p1)])
        return pair, read_flo(pf)

    def batches(
        self, batch_size: int, shuffle: bool = True, seed: int = 0,
        replicate_frames_to_channels: bool = True,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """(pairs (B, H, W, 6) float32, flows (B, H, W, 2)) minibatches —
        the channel-concat input format of FlowNetC/S/SD."""
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for lo in range(0, len(self), batch_size):
            sel = order[lo : lo + batch_size]
            pairs, flows = zip(*(self[i] for i in sel))
            pairs = np.stack(pairs).astype(np.float32)  # (B, 2, H, W, 3)
            x = np.concatenate([pairs[:, 0], pairs[:, 1]], axis=-1)
            yield x, np.stack(flows).astype(np.float32)


class MpiSintel(PairFlowDataset):
    def __init__(self, root: str, dstype: str = "clean"):
        triples = []
        flow_root = os.path.join(root, "flow")
        img_root = os.path.join(root, dstype)
        for scene in sorted(os.listdir(img_root)) if os.path.isdir(img_root) else []:
            frames = sorted(
                glob.glob(os.path.join(img_root, scene, "frame_*.png"))
            )
            for a, b in zip(frames[:-1], frames[1:]):
                stem = os.path.splitext(os.path.basename(a))[0]
                fl = os.path.join(flow_root, scene, stem + ".flo")
                if os.path.exists(fl):
                    triples.append((a, b, fl))
        super().__init__(triples)


class FlyingChairs(PairFlowDataset):
    def __init__(self, root: str):
        triples = []
        for fl in sorted(glob.glob(os.path.join(root, "*flow.flo"))):
            base = fl[: -len("flow.flo")]
            for fmt in ("img_0.ppm", "img1.ppm"):
                a = base + fmt
                b = base + fmt.replace("0", "1").replace("img1", "img2")
                if os.path.exists(a) and os.path.exists(b):
                    triples.append((a, b, fl))
                    break
        super().__init__(triples)


class ChairsSDHom(PairFlowDataset):
    def __init__(self, root: str, split: str = "train"):
        base = os.path.join(root, split)
        triples = []
        for t0 in sorted(glob.glob(os.path.join(base, "t0", "*"))):
            name = os.path.basename(t0)
            t1 = os.path.join(base, "t1", name)
            fl = os.path.join(
                base, "flow", os.path.splitext(name)[0] + ".flo"
            )
            if os.path.exists(t1) and os.path.exists(fl):
                triples.append((t0, t1, fl))
        super().__init__(triples)
