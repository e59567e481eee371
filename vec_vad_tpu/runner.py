"""Disk-based pipeline orchestration — the library equivalents of the
reference's `python train.py` / `python test.py` / `python
calc_optical_flow.py` entry points (train_and_test.sh), with the boolean
stage flags replaced by the content-hash artifact cache.

Layout conventions match the reference:
  <base>/raw_datasets/<name>/...                 frames + GT
  <base>/raw_datasets/<name>/bboxes_{split}_{mode}.npy   bbox fixtures
  <base>/optical_flow/<name>/...                 mirrored flow .npy tree
  <base>/data/...                                cached artifacts
  <base>/results/<name>/...                      scores + curves
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from vec_vad_tpu.config import PipelineConfig
from vec_vad_tpu.data.readers import (
    LazyFlowStack,
    LazyFrameStack,
    load_frame_labels,
)
from vec_vad_tpu.data.video_index import VideoIndex
from vec_vad_tpu.eval.metrics import save_roc_pr_curve_data
from vec_vad_tpu.fore.detector import (
    PrecomputedDetector,
    compute_foreground_bboxes,
)
from vec_vad_tpu.pipeline import (
    CubeSet,
    VadModel,
    extract_cube_set,
    frame_level_scores,
    make_trainer,
    pixel_score_masks,
    score_cubes,
    train_model,
)
from vec_vad_tpu.runtime.artifacts import (
    ArtifactCache,
    fingerprint,
    load_vad_model,
    save_vad_model,
)


@dataclass
class SplitData:
    index: VideoIndex
    frames: "LazyFrameStack"
    flow: Optional["LazyFlowStack"]
    boxes: List[np.ndarray]


def _dataset_root(cfg: PipelineConfig, base: str) -> str:
    return os.path.join(base, cfg.raw_dataset_dir, cfg.dataset_name)


@functools.lru_cache(maxsize=2)
def _mmdet_detector(checkpoint_path: str):
    """Converted-checkpoint appearance detector, memoized so the train and
    test splits share one loaded model (first compile is expensive)."""
    from vec_vad_tpu.fore.mmdet_detector import MMDetCascadeDetector

    return MMDetCascadeDetector.from_checkpoint(checkpoint_path)


def _resolve_detector(cfg: PipelineConfig):
    """Appearance detector for on-the-fly localization: a configured mmdet
    checkpoint powers the appearance stage (the reference's
    fore_det/inference.py path); without one, obj_det modes degrade to
    motion-only (empty appearance detections)."""
    if (cfg.fore.extraction_mode.startswith("obj_det")
            and cfg.fore.mmdet_checkpoint):
        return _mmdet_detector(cfg.fore.mmdet_checkpoint)
    if cfg.fore.extraction_mode.startswith("obj_det"):
        return lambda img: (np.zeros((0, 4)), np.zeros(0))
    return None


def load_split(cfg: PipelineConfig, base: str, split: str) -> SplitData:
    """Assemble one split's inputs: index, lazy frames, optional flow tree,
    and foreground boxes (fixture file if present, else computed)."""
    root = _dataset_root(cfg, base)
    spec = cfg.dataset
    index = VideoIndex.from_layout(cfg.dataset_name, root, split, spec.file_ext)
    if index.total_frames == 0:
        raise FileNotFoundError(f"no frames under {root} for split {split!r}")
    from vec_vad_tpu.runtime.native_loader import make_frame_stack

    frames = make_frame_stack(index)

    of_root = os.path.join(base, cfg.optical_flow_dir, cfg.dataset_name)
    flow = None
    if os.path.isdir(of_root) and cfg.modality in ("raw2flow", "optical_flow"):
        try:
            flow = LazyFlowStack(index, of_root, root)
        except FileNotFoundError:
            flow = None

    fixture = os.path.join(
        root, f"bboxes_{split}_{cfg.fore.extraction_mode}.npy"
    )
    if os.path.exists(fixture):
        det = PrecomputedDetector(fixture)
        boxes = [det.boxes_for_frame(i) for i in range(index.total_frames)]
    else:
        # motion modes need decoded frames chunk by chunk; materialize lazily
        boxes = compute_foreground_bboxes(
            cfg, spec, index, frames=frames, detector=_resolve_detector(cfg)
        )
    return SplitData(index=index, frames=frames, flow=flow, boxes=boxes)


def _extract_cached(
    cfg: PipelineConfig, base: str, split: str, data: SplitData, block_mode: int
) -> CubeSet:
    cache = ArtifactCache(os.path.join(base, cfg.data_root_dir, cfg.modality))
    # Box CONTENT must be part of the key: re-detected boxes with the same
    # per-frame counts would otherwise serve a stale cube cache.
    boxes_blob = (
        np.concatenate([np.asarray(b, np.float64).reshape(-1) for b in data.boxes])
        if data.boxes else np.zeros(0)
    )
    # Frame PROVENANCE too: regenerated/re-decoded frames with unchanged
    # boxes would otherwise serve cubes extracted from the old pixels.
    # Cheap stat()-level signature (path, size, mtime) for on-disk trees;
    # a strided content sample for in-memory arrays.
    if data.index.frame_paths is not None:
        frames_sig = [
            (p, os.path.getsize(p), os.path.getmtime(p))
            for p in data.index.frame_paths
        ]
    else:
        arr = np.asarray(data.frames)
        frames_sig = [str(arr.shape), str(arr.dtype),
                      arr.reshape(-1)[:: max(1, arr.size // 65536)].copy()]
    fp = fingerprint(
        cfg.fore, cfg.model.context_frame_num, cfg.model.context_of_num,
        cfg.model.border_mode, split, block_mode, data.index.total_frames,
        boxes_blob, data.flow is not None, frames_sig,
    )

    def compute():
        return extract_cube_set(
            cfg, cfg.dataset, data.index, data.frames, data.boxes,
            flow_frames=data.flow, block_mode=block_mode,
        )

    def save(path, cubes: CubeSet):
        np.savez_compressed(
            path,
            raw=cubes.raw,
            flow=(cubes.flow if cubes.flow is not None else np.zeros(0)),
            has_flow=np.array(cubes.flow is not None),
            frame_ids=cubes.frame_ids,
            boxes=cubes.boxes,
            cells=cubes.cells,
            scenes=cubes.scenes,
        )

    def load(path):
        with np.load(path) as z:
            return CubeSet(
                raw=z["raw"],
                flow=z["flow"] if bool(z["has_flow"]) else None,
                frame_ids=z["frame_ids"],
                boxes=z["boxes"],
                cells=z["cells"],
                scenes=z["scenes"],
            )

    return cache.get_or_compute(f"foreground_{split}", fp, compute, save, load)


def run_train(
    cfg: PipelineConfig,
    base: str,
    seed: int = 0,
    log_every: int = 0,
    resident: bool = False,
) -> Tuple[VadModel, str]:
    """Full training pipeline; returns the model and its artifact path.

    resident=True extracts cubes device-resident (they never leave HBM on
    the way to the trainer — see pipeline.extract_cube_set_resident) and
    skips the on-disk cube cache; the fastest path on remote/tunneled
    accelerators, at the cost of re-extracting on every run."""
    data = load_split(cfg, base, "train")
    if resident:
        from vec_vad_tpu.pipeline import extract_cube_set_resident

        cubes = extract_cube_set_resident(
            cfg, cfg.dataset, data.index, data.frames, data.boxes,
            flow_frames=data.flow, block_mode=cfg.fore.train_block_mode,
        )
    else:
        cubes = _extract_cached(
            cfg, base, "train", data, cfg.fore.train_block_mode
        )
    trainer = make_trainer(cfg)
    model = train_model(cfg, cubes, trainer=trainer, seed=seed, log_every=log_every)
    out_dir = os.path.join(base, cfg.data_root_dir, cfg.modality)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(
        out_dir,
        f"{cfg.dataset_name}_model_{cfg.fore.extraction_mode}_{cfg.method}.npz",
    )
    save_vad_model(path, model)
    return model, path


def run_test(
    cfg: PipelineConfig,
    base: str,
    model: Optional[VadModel] = None,
    save_masks: bool = False,
    per_video_norm: bool = False,
    pixel_criterion: bool = False,
    resident: bool = False,
) -> dict:
    """Scoring + evaluation; returns a result dict with AUROC etc.

    per_video_norm: min-max normalize frame scores within each video before
    AUROC (optional evaluation variant; the reference normalizes only by
    training statistics).
    pixel_criterion: also evaluate the pixel-level coverage criterion
    (eval.metrics.pixel_level_roc; needs pixel GT masks — ped-layout or
    avenue). Adds 'pixel_auroc' to the result.
    resident: extract the test split device-resident (cubes stay in HBM
    for scoring; skips the on-disk cube cache) — like run_train's flag.
    """
    if model is None:
        path = os.path.join(
            base, cfg.data_root_dir, cfg.modality,
            f"{cfg.dataset_name}_model_{cfg.fore.extraction_mode}_{cfg.method}.npz",
        )
        model = load_vad_model(path)
    data = load_split(cfg, base, "test")
    if resident:
        from vec_vad_tpu.pipeline import extract_cube_set_resident

        cubes = extract_cube_set_resident(
            cfg, cfg.dataset, data.index, data.frames, data.boxes,
            flow_frames=data.flow, block_mode=cfg.fore.test_block_mode,
        )
    else:
        cubes = _extract_cached(
            cfg, base, "test", data, cfg.fore.test_block_mode
        )
    trainer = make_trainer(cfg)
    cube_scores = score_cubes(model, cubes, trainer=trainer)
    n = data.index.total_frames
    frame_scores = frame_level_scores(cube_scores, cubes, n)

    results_dir = os.path.join(base, cfg.results_dir, cfg.dataset_name)
    os.makedirs(results_dir, exist_ok=True)
    masks = None
    if save_masks or pixel_criterion:
        # actual stream geometry, not the config table's (synthetic
        # workspaces run reduced frame sizes under a real dataset name)
        frame_hw = tuple(data.frames.shape[1:3])
        masks = pixel_score_masks(cube_scores, cubes, n, frame_hw)
        if save_masks:
            np.save(os.path.join(results_dir, "score_masks.npy"), masks)

    if per_video_norm:
        from vec_vad_tpu.score.scoring import normalize_scores_per_video

        frame_scores = normalize_scores_per_video(
            frame_scores, data.index.frame_video_idx
        )

    root = _dataset_root(cfg, base)
    labels = load_frame_labels(cfg.dataset_name, root, data.index)
    out = evaluate_frame_scores(
        cfg, results_dir, frame_scores, labels, data.index.scene_idx
    )
    out["frame_scores"] = frame_scores
    out["labels"] = labels
    if pixel_criterion:
        from vec_vad_tpu.data.readers import load_pixel_masks
        from vec_vad_tpu.eval.metrics import pixel_level_roc

        gt_masks = load_pixel_masks(cfg.dataset_name, root, data.index)
        out["pixel_auroc"] = pixel_level_roc(
            masks,
            gt_masks,
            file_path=os.path.join(
                results_dir,
                f"{cfg.modality}_{cfg.fore.extraction_mode}_{cfg.method}"
                "_pixel_results.npz",
            ),
        )
    return out


def evaluate_frame_scores(
    cfg: PipelineConfig,
    results_dir: str,
    frame_scores: np.ndarray,
    labels: np.ndarray,
    scene_idx: Optional[np.ndarray] = None,
) -> dict:
    """Frame-criterion evaluation with the reference's scene semantics
    (test.py:370-399): single-scene datasets get one ROC/PR artifact;
    a multi-scene partition gets one artifact per scene plus the
    unweighted mean AUROC over scenes as the headline number.

    With the reference's own datasets scene_idx is all-ones — even
    ShanghaiTech, whose per-scene branch therefore degenerates to one
    group (vad_datasets.py:690-691) — so this branch fires only for
    indexes carrying a real per-scene partition.
    """
    stem = f"{cfg.modality}_{cfg.fore.extraction_mode}_{cfg.method}_frame_results"
    scene_ids = (
        sorted(set(int(s) for s in scene_idx)) if scene_idx is not None else [1]
    )
    if len(scene_ids) > 1:
        per_scene = {}
        for si in scene_ids:
            mask = scene_idx == si
            path_si = os.path.join(results_dir, f"{stem}_scene_{si}.npz")
            per_scene[si] = save_roc_pr_curve_data(
                frame_scores[mask], labels[mask], path_si
            )
        return {
            "auroc": float(np.mean(list(per_scene.values()))),
            "auroc_per_scene": per_scene,
            "results_path": results_dir,
        }
    results_path = os.path.join(results_dir, f"{stem}.npz")
    auroc = save_roc_pr_curve_data(frame_scores, labels, results_path)
    return {"auroc": auroc, "results_path": results_path}


def run_calc_flow(
    cfg: PipelineConfig,
    base: str,
    checkpoint: Optional[str] = None,
    splits: Tuple[str, ...] = ("train", "test"),
    chunk: Optional[int] = None,
    resident: bool = False,
    segment_frames: Optional[int] = None,
    memory_budget_bytes: float = 4e9,
    max_whole_split_frames: int = 512,
    flow_dtype: str = "float32",
    use_mesh: bool = True,
) -> None:
    """Precompute the optical-flow tree with FlowNet2
    (calc_optical_flow.py equivalent). resident=True computes each
    split's flow in one device call (flow.driver.compute_optical_flow).

    Splits whose frames + flow exceed `memory_budget_bytes` (avenue ~19 GB,
    ShanghaiTech ~1.2 TB) automatically stream through the segmented path:
    lazy per-segment decode, one device call per segment, each frame's
    .npy written immediately — bounded RSS and HBM at any scale, like the
    reference's one-frame-at-a-time loop (calc_optical_flow.py:25-85).
    `segment_frames` forces the segmented path with that segment size.

    Splits longer than `max_whole_split_frames` also take the segmented
    path even when they fit the memory budget: the whole-split program is
    ONE device execution of n/chunk FlowNet2 iterations, and a 2550-frame
    UCSDped2 split (an ~80 s single execution) crashed the remote TPU
    worker mid-run — per-segment calls keep every execution bounded.

    flow_dtype='bfloat16' runs the FlowNet forward in bf16 (.npy output
    stays f32): 2.1x maps/s on hardware at the 384x512 protocol, with
    the batch default bumped to 8 (chunk=None picks 4 for f32, 8 for
    bf16 — the measured per-geometry optima, PROFILE.md §5). Flow values
    shift by bf16 rounding; keep float32 when reproducing reference
    scores bit-for-bit matters more than speed.

    use_mesh=True (default) runs the FlowNet forwards data-parallel over
    ALL visible devices when more than one is present (flow.driver
    _make_run_pairs: the pair axis shard_mapped over a 1-D mesh, zero
    collectives, outputs identical to single-device) — calc-flow is the
    heaviest offline stage and scales embarrassingly. Single-device runs
    are untouched (no sharding annotations; they cost 10x on a 1-device
    mesh here). The mesh rides the device-resident pair scan, so it
    applies to the segmented path and to whole-split runs with
    resident=True; a non-resident whole-split run (per-chunk host loop)
    stays single-device."""
    import jax
    import jax.numpy as jnp

    from vec_vad_tpu.flow.driver import (
        compute_optical_flow,
        compute_optical_flow_segmented,
        flow_tree_writer,
        save_flow_tree,
    )
    from vec_vad_tpu.models.flownet import FlowNet2, load_flownet2_checkpoint

    mesh = None
    if use_mesh and jax.device_count() > 1:
        from vec_vad_tpu.parallel.mesh import get_mesh

        mesh = get_mesh()

    chunk = chunk if chunk is not None else (
        8 if flow_dtype == "bfloat16" else 4
    )
    net = FlowNet2()
    x0 = jnp.zeros((1, 2, 384, 512, 3))
    if checkpoint:
        variables, report = load_flownet2_checkpoint(net, x0, checkpoint)
        print(f"loaded checkpoint: {len(report['matched'])} tensors")
    else:
        variables = net.init(jax.random.key(0), x0)
        print("WARNING: no checkpoint — random-init FlowNet2")

    root = _dataset_root(cfg, base)
    of_root = os.path.join(base, cfg.optical_flow_dir, cfg.dataset_name)
    for split in splits:
        index = VideoIndex.from_layout(
            cfg.dataset_name, root, split, cfg.dataset.file_ext
        )
        lazy = LazyFrameStack(index)
        n = index.total_frames
        # frames (uint8) + flow (2 x f32) for the whole split
        footprint = float(np.prod(lazy.shape)) * (1.0 + 8.0 / lazy.shape[-1])
        if (segment_frames or footprint > memory_budget_bytes
                or n > max_whole_split_frames):
            seg = segment_frames or min(
                max_whole_split_frames,
                max(chunk, int(memory_budget_bytes // (footprint / n)) // 2),
            )
            write = flow_tree_writer(index, of_root, root)
            if mesh is not None:
                print(
                    f"calc-flow: data-parallel over {mesh.devices.size} "
                    "devices"
                )
            compute_optical_flow_segmented(
                net, variables, index, lazy, write,
                segment_frames=seg, chunk=chunk, compute_dtype=flow_dtype,
                mesh=mesh,
            )
            print(
                f"{split}: wrote {n} flow maps to {of_root} "
                f"(segmented, {seg} frames/segment)"
            )
        else:
            frames = np.asarray(lazy)
            # the mesh rides the device-resident pair scan only; the
            # non-resident path is a per-chunk host loop (no shard_map)
            if mesh is not None and resident:
                print(
                    f"calc-flow: data-parallel over {mesh.devices.size} "
                    "devices"
                )
            flow = compute_optical_flow(
                net, variables, index, frames, chunk=chunk,
                resident=resident, compute_dtype=flow_dtype,
                mesh=mesh if resident else None,
            )
            save_flow_tree(flow, index, of_root, root)
            print(f"{split}: wrote {flow.shape[0]} flow maps to {of_root}")


def run_precompute_boxes(
    cfg: PipelineConfig,
    base: str,
    splits: Tuple[str, ...] = ("train", "test"),
    overwrite: bool = False,
) -> List[str]:
    """Generate the per-split bbox fixture files the pipeline auto-detects
    (`bboxes_{split}_{mode}.npy`, object array of (N_i, 4) float32) — the
    reference's fore_det precomputation products (README.md:51,
    train.py:52-100 `*_bbox_saved` flags). With `mmdet_checkpoint`
    configured the appearance stage runs the converted Cascade R-CNN;
    otherwise obj_det modes degrade to motion-only exactly like
    load_split's on-the-fly path."""
    from vec_vad_tpu.runtime.native_loader import make_frame_stack

    root = _dataset_root(cfg, base)
    spec = cfg.dataset
    written = []
    for split in splits:
        out = os.path.join(
            root, f"bboxes_{split}_{cfg.fore.extraction_mode}.npy"
        )
        if os.path.exists(out) and not overwrite:
            print(f"{out} exists; skipping (--overwrite to regenerate)")
            continue
        index = VideoIndex.from_layout(
            cfg.dataset_name, root, split, spec.file_ext
        )
        if index.total_frames == 0:
            raise FileNotFoundError(f"no frames under {root} for {split!r}")
        frames = make_frame_stack(index)
        boxes = compute_foreground_bboxes(
            cfg, spec, index, frames=frames, detector=_resolve_detector(cfg)
        )
        arr = np.empty(len(boxes), dtype=object)
        for i, b in enumerate(boxes):
            arr[i] = np.asarray(b, dtype=np.float32).reshape(-1, 4)
        np.save(out, arr, allow_pickle=True)
        written.append(out)
        print(f"wrote {out} ({len(boxes)} frames)")
    return written
