"""Disk-workspace runner: train -> artifacts -> test -> AUROC + curves,
through the same INI config surface as the reference scripts."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vec_vad_tpu.config import load_ini_config
from vec_vad_tpu.data.synthetic import make_synthetic_dataset
from vec_vad_tpu.runner import run_test, run_train

CFG = """
[shared_parameters]
dataset_name = UCSDped2
raw_dataset_dir = raw_datasets
foreground_extraction_mode = obj_det_with_motion
data_root_dir = data
modality = raw2flow
method = SelfComplete

[UCSDped2]
patch_size=16
h_block=1
w_block=1
motionThr = 0

[SelfComplete]
border_mode = predict
epochs = 2
batch_size = 16
nf = 4
useFlow = False
context_frame_num = 4
context_of_num = 0
rawRange = 10
padding = False
lambda_raw = 1.0
lambda_of = 1.0
w_raw = 1
w_of = 1
"""


def test_multi_scene_evaluation(tmp_path):
    """Reference test.py:371-386: a multi-scene partition is evaluated
    per scene (one ROC/PR .npz per scene) and the headline AUROC is the
    unweighted mean over scenes."""
    from vec_vad_tpu.eval.metrics import evaluate_scores
    from vec_vad_tpu.runner import evaluate_frame_scores

    cfg_path = os.path.join(str(tmp_path), "config.cfg")
    with open(cfg_path, "w") as f:
        f.write(CFG)
    cfg = load_ini_config(cfg_path)

    rng = np.random.default_rng(7)
    n = 120
    scene_idx = np.repeat([1, 2, 3], n // 3)
    labels = rng.integers(0, 2, n).astype(bool)
    # make scene AUROCs differ: scene 1 informative, others noisy
    scores = rng.normal(size=n)
    scores[: n // 3] += 3.0 * labels[: n // 3]

    results_dir = os.path.join(str(tmp_path), "results")
    os.makedirs(results_dir, exist_ok=True)
    out = evaluate_frame_scores(cfg, results_dir, scores, labels, scene_idx)

    per_scene = [
        evaluate_scores(
            scores[scene_idx == si], labels[scene_idx == si]
        ).roc_auc
        for si in (1, 2, 3)
    ]
    assert out["auroc"] == pytest.approx(float(np.mean(per_scene)))
    assert set(out["auroc_per_scene"]) == {1, 2, 3}
    for si, ref in zip((1, 2, 3), per_scene):
        assert out["auroc_per_scene"][si] == pytest.approx(ref)
        assert os.path.exists(
            os.path.join(
                results_dir,
                f"raw2flow_obj_det_with_motion_SelfComplete_"
                f"frame_results_scene_{si}.npz",
            )
        )

    # all-ones partition (every reference dataset incl. ShanghaiTech,
    # vad_datasets.py:690-691) degenerates to the single-artifact path
    out1 = evaluate_frame_scores(
        cfg, results_dir, scores, labels, np.ones(n, np.int64)
    )
    assert out1["auroc"] == pytest.approx(
        evaluate_scores(scores, labels).roc_auc
    )
    assert "auroc_per_scene" not in out1


def test_runner_end_to_end(tmp_path):
    base = str(tmp_path)
    make_synthetic_dataset(
        root=os.path.join(base, "raw_datasets", "UCSDped2"),
        frames_per_video=16, n_train_videos=1, n_test_videos=1,
        frame_h=48, frame_w=64, seed=4, write_to_disk=True,
    )
    cfg_path = os.path.join(base, "config.cfg")
    with open(cfg_path, "w") as f:
        f.write(CFG)
    cfg = load_ini_config(cfg_path)

    model, path = run_train(cfg, base)
    assert os.path.exists(path)
    assert len(model.blocks) >= 1

    res = run_test(cfg, base, model=model, save_masks=True)
    assert 0.0 <= res["auroc"] <= 1.0
    assert os.path.exists(res["results_path"])
    masks = np.load(os.path.join(base, "results", "UCSDped2", "score_masks.npy"))
    assert masks.shape[0] == res["frame_scores"].shape[0]

    # reload-from-disk path (model=None)
    res2 = run_test(cfg, base)
    np.testing.assert_allclose(res2["frame_scores"], res["frame_scores"], rtol=1e-5)

    # the foreground cache is reused: artifacts dir has exactly one
    # train + one test foreground file
    arts = os.listdir(os.path.join(base, "data", "raw2flow"))
    assert sum(a.startswith("foreground_train") for a in arts) == 1
    assert sum(a.startswith("foreground_test") for a in arts) == 1


def test_cli_explicit_config_must_exist(tmp_path):
    """A typo'd --config path must raise, not silently train with the
    built-in defaults (and overwrite artifacts under the default name) —
    including the literal 'config.cfg' typed explicitly from the wrong
    directory. The no-flag default (None) falls back to ./config.cfg if
    present, else built-in defaults."""
    import argparse

    from vec_vad_tpu.cli import _load_cfg

    for path in [str(tmp_path / "nope.cfg"), "config.cfg"]:
        with pytest.raises(FileNotFoundError, match=path):
            _load_cfg(argparse.Namespace(config=path, dataset=None))
    # no flag, no ./config.cfg -> built-in defaults, no error
    cfg = _load_cfg(argparse.Namespace(config=None, dataset=None))
    assert cfg.dataset_name == "UCSDped2"
    # no flag WITH a ./config.cfg in cwd -> the convenience fallback loads it
    (tmp_path / "config.cfg").write_text(CFG.replace("UCSDped2", "avenue"))
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        cfg = _load_cfg(argparse.Namespace(config=None, dataset=None))
    finally:
        os.chdir(cwd)
    assert cfg.dataset_name == "avenue"


def test_extraction_cache_invalidates_on_frame_change(tmp_path):
    """Regenerated frames with unchanged boxes must NOT serve the stale
    cube cache (the fingerprint includes frame provenance)."""
    base = str(tmp_path)
    ds_kw = dict(
        root=os.path.join(base, "raw_datasets", "UCSDped2"),
        frames_per_video=16, n_train_videos=1, n_test_videos=1,
        frame_h=48, frame_w=64, write_to_disk=True,
    )
    make_synthetic_dataset(seed=4, **ds_kw)
    cfg_path = os.path.join(base, "config.cfg")
    with open(cfg_path, "w") as f:
        f.write(CFG)
    cfg = load_ini_config(cfg_path)

    # pin the boxes with a fixture file so ONLY the frames change between
    # runs — the stale-cache bug needs identical boxes to manifest
    from vec_vad_tpu.runner import load_split

    data = load_split(cfg, base, "train")
    arr = np.empty(len(data.boxes), dtype=object)
    for i, b in enumerate(data.boxes):
        arr[i] = np.asarray(b, np.float32).reshape(-1, 4)
    np.save(
        os.path.join(base, "raw_datasets", "UCSDped2",
                     "bboxes_train_obj_det_with_motion.npy"),
        arr, allow_pickle=True,
    )

    run_train(cfg, base)
    arts = os.path.join(base, "data", "raw2flow")
    n0 = sum(a.startswith("foreground_train") for a in os.listdir(arts))
    assert n0 == 1

    # re-render the frames (different seed => different pixels); keep the
    # same tree. Bump mtimes to be newer even on coarse-mtime filesystems.
    make_synthetic_dataset(seed=9, **ds_kw)
    import glob
    import time

    t = time.time() + 10
    for p in glob.glob(
        os.path.join(base, "raw_datasets", "UCSDped2", "Train", "*", "*")
    ):
        os.utime(p, (t, t))
    run_train(cfg, base)
    n1 = sum(
        a.startswith("foreground_train") for a in os.listdir(arts)
    )
    assert n1 == 2  # a second cube artifact: the cache missed as it must


def test_cli_export_torch(tmp_path):
    """`export-torch` writes the reference's three torch artifacts from
    the trained .npz model; the model grid strict-loads into the actual
    reference torch module (full interop chain through the CLI surface)."""
    torch = pytest.importorskip("torch")
    base = str(tmp_path)
    make_synthetic_dataset(
        root=os.path.join(base, "raw_datasets", "UCSDped2"),
        frames_per_video=16, n_train_videos=1, n_test_videos=1,
        frame_h=48, frame_w=64, seed=9, write_to_disk=True,
    )
    cfg_path = os.path.join(base, "config.cfg")
    with open(cfg_path, "w") as f:
        f.write(CFG.replace("epochs = 2", "epochs = 1"))
    cfg = load_ini_config(cfg_path)
    run_train(cfg, base)

    from vec_vad_tpu.cli import main

    out = os.path.join(base, "torch_export")
    rc = main(["export-torch", "--config", cfg_path, "--base", base,
               "--out", out])
    assert rc == 0
    ms = torch.load(
        os.path.join(
            out, "UCSDped2_model_obj_det_with_motion_SelfComplete.npy"
        ),
        weights_only=False,
    )
    sds = [c[0] for row in ms for c in row if c]
    assert sds, "no trained blocks exported"
    if os.path.exists("/root/reference/model/unet.py"):
        import sys

        sys.path.insert(0, "/root/reference")
        try:
            from model.unet import SelfCompleteNet4
        finally:
            sys.path.pop(0)
        ref = torch.nn.DataParallel(SelfCompleteNet4(
            features_root=4, tot_raw_num=5, tot_of_num=1,
            border_mode="predict", rawRange=None, useFlow=False,
            padding=False,
        ))
        ref.load_state_dict(sds[0], strict=True)


def test_cli_fleet_camera_scenes(tmp_path, capsys):
    """`serve --cameras C --camera-scenes ...` routes each camera through
    its own scene row of the block grid (test.py:282 model_set[scene-1]
    semantics per camera): identical frames on two cameras assigned
    different scenes score differently when the scenes' block statistics
    differ; identical assignments keep the fleet spread at zero."""
    from vec_vad_tpu.cli import main
    from vec_vad_tpu.runtime.artifacts import load_vad_model, save_vad_model
    from vec_vad_tpu.train.trainer import TrainedBlock

    base = str(tmp_path)
    make_synthetic_dataset(
        root=os.path.join(base, "raw_datasets", "UCSDped2"),
        frames_per_video=16, n_train_videos=1, n_test_videos=1,
        frame_h=48, frame_w=64, seed=4, write_to_disk=True,
    )
    cfg_path = os.path.join(base, "config.cfg")
    with open(cfg_path, "w") as f:
        f.write(CFG)
    cfg = load_ini_config(cfg_path)
    model, path = run_train(cfg, base)

    # graft a scene-2 row: same weights, shifted z-norm statistics, so a
    # camera routed to scene 2 scores measurably differently
    blk = model.blocks[(0, 0, 0)]
    model.blocks[(1, 0, 0)] = TrainedBlock(
        params=blk.params, batch_stats=blk.batch_stats,
        raw_scores=blk.raw_scores * 3.0 + 5.0, of_scores=None,
    )
    save_vad_model(path, model)
    assert set(load_vad_model(path).blocks) == {(0, 0, 0), (1, 0, 0)}

    args = ["serve", "--config", cfg_path, "--base", base,
            "--cameras", "2", "--frames", "8"]
    rc = main(args + ["--camera-scenes", "1,2"])
    assert rc == 0
    split = capsys.readouterr().out.split("cross-camera score spread")
    assert float(split[-1]) > 1e-3

    rc = main(args + ["--camera-scenes", "1"])
    assert rc == 0
    split = capsys.readouterr().out.split("cross-camera score spread")
    assert float(split[-1]) == 0.0

    with pytest.raises(SystemExit, match="needs 2 values"):
        main(args + ["--camera-scenes", "1,2,1"])
