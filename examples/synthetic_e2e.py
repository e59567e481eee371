"""Runnable end-to-end demo on a synthetic dataset (no real data needed).

    JAX_PLATFORMS=cpu python examples/synthetic_e2e.py

Generates a tiny UCSDped2-layout dataset on disk, runs the full pipeline
through the same runner the CLI uses (foreground localization via the
batched motion detector, cube extraction, ensemble training, scoring,
AUROC), and prints the results. Takes a few minutes on one CPU core.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vec_vad_tpu.config import (
    CompletionConfig,
    ForegroundConfig,
    PipelineConfig,
)
from vec_vad_tpu.data.synthetic import make_synthetic_dataset
from vec_vad_tpu.runner import run_test, run_train
from vec_vad_tpu.runtime.profiling import StageTimer


def main() -> int:
    import numpy as np

    base = tempfile.mkdtemp(prefix="vadws_")
    print(f"workspace: {base}")
    root = os.path.join(base, "raw_datasets", "UCSDped2")
    ds = make_synthetic_dataset(
        root=root,
        frames_per_video=36, n_train_videos=3, n_test_videos=2,
        frame_h=48, frame_w=64, seed=3, write_to_disk=True,
    )
    # Ship bbox fixtures alongside the frames (the reference's supported
    # precomputed-bbox route, README.md:51) — the runner auto-detects them.
    # Without fixtures it falls back to the on-device motion detector.
    np.save(
        os.path.join(root, "bboxes_train_obj_det_with_motion.npy"),
        np.array(ds.train_boxes, dtype=object), allow_pickle=True,
    )
    np.save(
        os.path.join(root, "bboxes_test_obj_det_with_motion.npy"),
        np.array(ds.test_boxes, dtype=object), allow_pickle=True,
    )

    cfg = PipelineConfig(
        dataset_name="UCSDped2",
        fore=ForegroundConfig(patch_size=16, max_boxes_per_frame=8),
        model=CompletionConfig(
            nf=8, epochs=8, batch_size=32, context_of_num=0, use_flow=False
        ),
    )

    timer = StageTimer()
    with timer.stage("train"):
        model, path = run_train(cfg, base)
    print(f"trained {len(model.blocks)} block(s) -> {path}")

    with timer.stage("test"):
        res = run_test(cfg, base, model=model, save_masks=True)
    print(f"frame-level AUROC: {res['auroc']:.4f}")
    print(timer.report())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
