"""Two-stream (raw + optical flow) whole-pipeline parity against the
reference's own torch modules.

test_reference_e2e.py pins the raw-only recipe (useFlow=False); this file
pins the λ-weighted two-stream configuration the published results use:
SelfCompleteNet4 (5raw1of) trained with
    loss = lambda_raw * MSE(raw_tgt.detach(), raw_out)
         + lambda_of  * MSE(of_tgt.detach(),  of_out)       (train.py:307-314)
and scored with per-stream z-normalization + weighted fusion
    w_raw * (raw - mu_r)/sd_r + w_of * (of - mu_o)/sd_o     (test.py:330-345).

Same determinism controls as the raw-only file: transplanted initial
weights, identical shuffled batch schedules, cube counts that are a
multiple of batch_size (no partial-batch BN), Adam-divergence tolerances.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

from test_reference_e2e import (  # noqa: E402
    CTX,
    PATCH,
    REF,
    SEED,
    _ref_extract,
    _stack_ref_cubes,
    _to_torch_inputs,
    frame_level_scores_ref,
)

from vec_vad_tpu.config import (  # noqa: E402
    CompletionConfig,
    DatasetSpec,
    ForegroundConfig,
    PipelineConfig,
    register_dataset,
)
from vec_vad_tpu.data.synthetic import make_synthetic_dataset  # noqa: E402
from vec_vad_tpu.data.video_index import VideoIndex  # noqa: E402
from vec_vad_tpu.eval.metrics import roc_auc_score  # noqa: E402
from vec_vad_tpu.models.completion import make_completion_net  # noqa: E402
from vec_vad_tpu.models.completion_convert import (  # noqa: E402
    convert_completion_state_dict,
)
from vec_vad_tpu.pipeline import (  # noqa: E402
    VadModel,
    extract_cube_set,
    frame_level_scores,
    make_trainer,
    score_cubes,
)


def _load_ref_net_twostream(nf, torch_seed=0):
    """Reference SelfCompleteNet4 with useFlow=True (5 raw UNets + 1 flow
    UNet, model/unet.py:73-267)."""
    if not os.path.exists(os.path.join(REF, "model", "unet.py")):
        pytest.skip("reference not mounted")
    sys.path.insert(0, REF)
    try:
        from model.unet import SelfCompleteNet4
    finally:
        sys.path.pop(0)
    torch.manual_seed(torch_seed)
    return SelfCompleteNet4(
        features_root=nf, tot_raw_num=5, tot_of_num=1,
        border_mode="predict", rawRange=None, useFlow=True, padding=False,
    )


def _pseudo_flow(frames: np.ndarray) -> np.ndarray:
    """Deterministic synthetic flow with structure tied to the frames."""
    d = np.diff(
        frames.astype(np.float32).mean(-1), axis=0, append=frames[-1:].mean(-1)
    )
    return np.stack([d, -d], axis=-1) / 20.0


def _to_torch_flow(stacked_f32):
    """(N, P, P, T_of*2) float32 -> (N, T_of*2, P, P) torch, UNSCALED (the
    ToTensor float path keeps flow magnitudes, vad_datasets.py:154-168)."""
    return torch.from_numpy(
        np.transpose(stacked_f32, (0, 3, 1, 2)).astype(np.float32)
    )


def _ref_train_twostream(net, inputs, of_all, epochs, bsz, seed,
                         lam_raw=1.0, lam_of=1.0):
    """train.py:300-324 two-stream loop: Adam(lr=1e-3, eps=1e-7, wd=0),
    shuffled batches, λ-weighted MSE on detached targets."""
    n = inputs.shape[0]
    opt = torch.optim.Adam(net.parameters(), lr=1e-3, eps=1e-7,
                           weight_decay=0.0)
    mse = torch.nn.MSELoss()
    rng = np.random.default_rng(seed)
    net.train()
    for _ in range(epochs):
        order = rng.permutation(n)
        for lo in range(0, n, bsz):
            sel = order[lo : lo + bsz]
            of_out, raw_out, of_tgt, raw_tgt = net(inputs[sel], of_all[sel])
            loss = lam_raw * mse(raw_tgt.detach(), raw_out) + lam_of * mse(
                of_tgt.detach(), of_out
            )
            opt.zero_grad()
            loss.backward()
            opt.step()
    return net


def _ref_score_twostream(net, inputs, of_all, bsz=32):
    """Eval-mode per-cube (raw, of) MSE sums over (C, H, W)
    (train.py:341-358, test.py:330-336)."""
    net.eval()
    raw_s, of_s = [], []
    with torch.no_grad():
        for lo in range(0, inputs.shape[0], bsz):
            of_out, raw_out, of_tgt, raw_tgt = net(
                inputs[lo : lo + bsz], of_all[lo : lo + bsz]
            )
            raw_s.append(
                np.square((raw_out - raw_tgt).numpy()).sum(axis=(1, 2, 3))
            )
            of_s.append(
                np.square((of_out - of_tgt).numpy()).sum(axis=(1, 2, 3))
            )
    return np.concatenate(raw_s), np.concatenate(of_s)


@pytest.fixture(scope="module")
def world2():
    ds = make_synthetic_dataset(
        frames_per_video=20, n_train_videos=2, n_test_videos=2,
        frame_h=48, frame_w=64, seed=5,
    )
    spec = DatasetSpec(
        name="synthOracle2", frame_h=48, frame_w=64, file_ext=".tif",
        scene_num=1, ap_score_thr=0.5, ap_min_area=16.0, cover_thr=0.6,
        mt_area_thr=16.0, mt_binary_thr=18.0, mt_extend=2,
        mt_gauss_mask_size=3,
    )
    register_dataset(spec)
    # motion_thr=-1: every cube passes the motion filter on both sides, so
    # cube counts stay multiples of batch_size (no partial-batch BN)
    cfg = PipelineConfig(
        dataset_name="synthOracle2",
        fore=ForegroundConfig(
            patch_size=PATCH, max_boxes_per_frame=8, motion_thr=-1.0
        ),
        model=CompletionConfig(
            nf=4, epochs=2, batch_size=20, context_of_num=0, use_flow=True,
        ),
    )
    train_idx = VideoIndex(["t0", "t1"], ds.train_video_lengths)
    test_idx = VideoIndex(["s0", "s1"], ds.test_video_lengths)
    train_flow = _pseudo_flow(ds.train_frames)
    test_flow = _pseudo_flow(ds.test_frames)
    train_cubes = extract_cube_set(
        cfg, spec, train_idx, ds.train_frames, ds.train_boxes,
        flow_frames=train_flow,
    )
    test_cubes = extract_cube_set(
        cfg, spec, test_idx, ds.test_frames, ds.test_boxes,
        flow_frames=test_flow,
        block_mode=cfg.fore.test_block_mode,
    )
    return (ds, spec, cfg, train_idx, test_idx, train_cubes, test_cubes,
            train_flow, test_flow)


def _transplanted_pair2(cfg):
    ref_net = _load_ref_net_twostream(cfg.model.nf)
    sd = {
        k: np.array(v.numpy(), copy=True)
        for k, v in ref_net.state_dict().items()
    }
    net = make_completion_net(cfg.model)
    variables = convert_completion_state_dict(sd, net)
    return ref_net, variables


def _ref_extract_flow(flow_frames, index, boxes_list, patch=PATCH):
    """Flow-cube extraction: context_of_num=0 -> single-frame windows;
    crop + cv2.resize of the float flow map (vad_datasets.py:70-93)."""
    cubes = []
    for f in range(index.total_frames):
        for b in np.asarray(boxes_list[f]).reshape(-1, 4):
            x0, x1 = int(np.ceil(b[0])), int(np.ceil(b[2]))
            y0, y1 = int(np.ceil(b[1])), int(np.ceil(b[3]))
            cubes.append(
                cv2.resize(flow_frames[f, y0:y1, x0:x1], (patch, patch))[None]
            )
    return np.asarray(cubes, np.float32)  # (N, 1, P, P, 2)


def test_twostream_extraction_parity(world2):
    """Flow cubes from the fused device path match the literal cv2 float
    resize (no uint8 quantization on the flow stream)."""
    ds, spec, cfg, train_idx, _, train_cubes, _, train_flow, _ = world2
    ref_f = _ref_extract_flow(train_flow, train_idx, ds.train_boxes)
    assert train_cubes.flow.shape[0] == ref_f.shape[0]
    stacked = _stack_ref_cubes(ref_f)  # (N, P, P, 2)
    np.testing.assert_allclose(train_cubes.flow, stacked, atol=2e-4)


def test_twostream_training_scoring_parity(world2):
    """Same cubes, same init, same schedule: per-cube raw AND of training
    scores, then test-cube scores, track the torch oracle."""
    (ds, spec, cfg, train_idx, test_idx, train_cubes, test_cubes,
     train_flow, test_flow) = world2
    n = train_cubes.size
    assert n % cfg.model.batch_size == 0

    ref_net, variables = _transplanted_pair2(cfg)
    trainer = make_trainer(cfg)
    blk = trainer.fit_block(
        train_cubes.raw, train_cubes.flow, seed=SEED,
        init_state=trainer.state_from_variables(variables),
    )

    inputs = _to_torch_inputs(train_cubes.raw)
    of_all = _to_torch_flow(train_cubes.flow)
    _ref_train_twostream(
        ref_net, inputs, of_all, cfg.model.epochs, cfg.model.batch_size, SEED
    )
    ref_raw, ref_of = _ref_score_twostream(ref_net, inputs, of_all)

    np.testing.assert_allclose(blk.raw_scores, ref_raw, rtol=0.02, atol=1e-4)
    np.testing.assert_allclose(blk.of_scores, ref_of, rtol=0.02, atol=1e-4)
    assert np.corrcoef(blk.raw_scores, ref_raw)[0, 1] > 0.9999
    assert np.corrcoef(blk.of_scores, ref_of)[0, 1] > 0.999

    ours_raw, ours_of = trainer.score_block(
        blk, test_cubes.raw, test_cubes.flow
    )
    ref_te_raw, ref_te_of = _ref_score_twostream(
        ref_net, _to_torch_inputs(test_cubes.raw), _to_torch_flow(test_cubes.flow)
    )
    np.testing.assert_allclose(ours_raw, ref_te_raw, rtol=0.02, atol=1e-4)
    np.testing.assert_allclose(ours_of, ref_te_of, rtol=0.02, atol=1e-4)


def test_twostream_full_recipe_auroc_parity(world2):
    """Both sides run the complete two-stream pipeline — extraction,
    λ-weighted training, per-stream z-norm, w-weighted fusion, mask-splat
    frame aggregation, AUROC (train.py:307-314 + test.py:330-358)."""
    (ds, spec, cfg, train_idx, test_idx, train_cubes, test_cubes,
     train_flow, test_flow) = world2
    n_frames = test_idx.total_frames

    # ours
    ref_net, variables = _transplanted_pair2(cfg)
    trainer = make_trainer(cfg)
    blk = trainer.fit_block(
        train_cubes.raw, train_cubes.flow, seed=SEED,
        init_state=trainer.state_from_variables(variables),
    )
    model = VadModel(cfg=cfg, blocks={(0, 0, 0): blk})
    cube_scores = score_cubes(model, test_cubes, trainer=trainer)
    ours_frame = frame_level_scores(cube_scores, test_cubes, n_frames)
    ours_auroc = roc_auc_score(ours_frame, ds.test_labels)

    # reference recipe end-to-end (its own cv2 extraction, both streams)
    ref_tr_c, _, _ = _ref_extract(ds.train_frames, train_idx, ds.train_boxes)
    ref_tr_f = _ref_extract_flow(train_flow, train_idx, ds.train_boxes)
    inputs = _to_torch_inputs(_stack_ref_cubes(ref_tr_c))
    of_all = _to_torch_flow(_stack_ref_cubes(ref_tr_f))
    _ref_train_twostream(
        ref_net, inputs, of_all, cfg.model.epochs, cfg.model.batch_size, SEED
    )
    tr_raw, tr_of = _ref_score_twostream(ref_net, inputs, of_all)
    mu_r, sd_r = tr_raw.mean(), tr_raw.std()
    mu_o, sd_o = tr_of.mean(), tr_of.std()

    ref_te_c, te_f, te_b = _ref_extract(ds.test_frames, test_idx, ds.test_boxes)
    ref_te_fl = _ref_extract_flow(test_flow, test_idx, ds.test_boxes)
    te_raw, te_of = _ref_score_twostream(
        ref_net,
        _to_torch_inputs(_stack_ref_cubes(ref_te_c)),
        _to_torch_flow(_stack_ref_cubes(ref_te_fl)),
    )
    fused = (
        cfg.model.w_raw * (te_raw - mu_r) / sd_r
        + cfg.model.w_of * (te_of - mu_o) / sd_o
    )  # test.py:330-345
    ref_frame = frame_level_scores_ref(fused, te_f, te_b, n_frames)
    ref_auroc = roc_auc_score(ref_frame, ds.test_labels)

    assert abs(ours_auroc - ref_auroc) < 0.02, (ours_auroc, ref_auroc)
    finite = (ours_frame > -99999) & (ref_frame > -99999)
    r_o = np.argsort(np.argsort(ours_frame[finite]))
    r_r = np.argsort(np.argsort(ref_frame[finite]))
    rho = np.corrcoef(r_o, r_r)[0, 1]
    assert rho > 0.97, f"frame-score rank correlation {rho}"
