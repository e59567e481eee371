"""Whole-pipeline parity against the reference implementation itself.

The reference's own torch modules (model/unet.py) import and run on CPU in
this environment, so the strongest available oracle for the *pipeline* —
extraction -> training -> scoring -> evaluation (train.py:240-437,
test.py:269-401) — is the reference recipe run end-to-end on the synthetic
dataset, compared stage by stage: cubes, per-cube training scores, fused
test scores, frame scores, and final AUROC.

Determinism controls: both sides start from the same transplanted initial
weights (models/completion_convert) and follow the identical shuffled batch
schedule (np.random.default_rng(seed), the exact order trainer.fit_block
uses). The cube count is kept a multiple of batch_size so torch's
partial-batch BatchNorm statistics never enter (see parallel/mesh.py
wrap-padding note). Adam's early steps are sign-like, so two numerically-
identical-in-math trajectories still diverge O(lr) per step; tolerances
account for that.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

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

REF = "/root/reference"
PATCH = 16
CTX = 4
SEED = 7


def _load_ref_net(nf, torch_seed=0):
    """Reference SelfCompleteNet4, raw-only (useFlow=False path,
    train.py:244,308-314)."""
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
        border_mode="predict", rawRange=None, useFlow=False, padding=False,
    )


# ---------------------------------------------------------------------------
# The reference recipe, run literally (cv2 loops + torch), on in-memory data
# ---------------------------------------------------------------------------


def _ref_extract(frames, index, boxes_list, patch=PATCH, ctx=CTX):
    """Reference STC extraction: per-bbox integer-ceil crop + cv2.resize of
    each context frame (vad_datasets.py:70-93); cubes stored (T, P, P, C)
    uint8 in frame order, box order (train.py:145-191). Context windows via
    context_indices, itself oracle-exact vs vad_datasets.py:277-354
    (tests/test_context.py)."""
    windows = index.context_indices(ctx, "predict")
    cubes, fids, boxes = [], [], []
    for f in range(index.total_frames):
        for b in np.asarray(boxes_list[f]).reshape(-1, 4):
            x0, x1 = int(np.ceil(b[0])), int(np.ceil(b[2]))
            y0, y1 = int(np.ceil(b[1])), int(np.ceil(b[3]))
            cube = np.stack(
                [
                    cv2.resize(frames[t, y0:y1, x0:x1], (patch, patch))
                    for t in windows[f]
                ]
            )
            cubes.append(cube)
            fids.append(f)
            boxes.append(b)
    return (
        np.asarray(cubes),
        np.asarray(fids, np.int64),
        np.asarray(boxes, np.float32),
    )


def _stack_ref_cubes(cubes_u8):
    """(N, T, P, P, C) -> (N, P, P, T*C): the T-major channel stack of
    cube_to_train_dataset (vad_datasets.py:154-160)."""
    n, t, p, _, c = cubes_u8.shape
    return np.transpose(cubes_u8, (0, 2, 3, 1, 4)).reshape(n, p, p, t * c)


def _to_torch_inputs(stacked_u8):
    """(N, P, P, T*C) uint8 -> (N, T*C, P, P) float in [0,1] (torchvision
    ToTensor semantics, vad_datasets.py:12-14)."""
    x = np.transpose(stacked_u8, (0, 3, 1, 2)).astype(np.float32) / 255.0
    return torch.from_numpy(x)


def _ref_score(net, inputs, bsz=32):
    """Eval-mode per-cube raw MSE sums over (C, H, W) (train.py:412-427,
    test.py:296-299)."""
    net.eval()
    out = []
    with torch.no_grad():
        for lo in range(0, inputs.shape[0], bsz):
            xb = inputs[lo : lo + bsz]
            of_dummy = torch.zeros((xb.shape[0], 2, PATCH, PATCH))
            _, raw_out, _, raw_tgt = net(xb, of_dummy)
            sq = np.square((raw_out - raw_tgt).numpy())
            out.append(sq.sum(axis=(1, 2, 3)))
    return np.concatenate(out)


def _ref_train(net, inputs, epochs, bsz, seed):
    """The reference block-training loop (train.py:375-402): Adam(lr=1e-3
    default, eps=1e-7, wd=0), shuffled batches, MSE on detached targets.
    The permutation stream matches trainer.fit_block exactly."""
    n = inputs.shape[0]
    opt = torch.optim.Adam(net.parameters(), lr=1e-3, eps=1e-7, weight_decay=0.0)
    mse = torch.nn.MSELoss()
    rng = np.random.default_rng(seed)
    net.train()
    for _ in range(epochs):
        order = rng.permutation(n)
        for lo in range(0, n, bsz):
            sel = order[lo : lo + bsz]
            xb = inputs[sel]
            of_dummy = torch.zeros((xb.shape[0], 2, PATCH, PATCH))
            _, raw_out, _, raw_tgt = net(xb, of_dummy)
            loss = mse(raw_tgt.detach(), raw_out)
            opt.zero_grad()
            loss.backward()
            opt.step()
    return net


# ---------------------------------------------------------------------------
# Shared world
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def world():
    ds = make_synthetic_dataset(
        frames_per_video=20, n_train_videos=2, n_test_videos=2,
        frame_h=48, frame_w=64, seed=5,
    )
    spec = DatasetSpec(
        name="synthOracle", frame_h=48, frame_w=64, file_ext=".tif",
        scene_num=1, ap_score_thr=0.5, ap_min_area=16.0, cover_thr=0.6,
        mt_area_thr=16.0, mt_binary_thr=18.0, mt_extend=2,
        mt_gauss_mask_size=3,
    )
    register_dataset(spec)
    # batch_size 20 divides the 80-cube splits: no partial batches, so the
    # wrap-pad BN deviation (parallel/mesh.py) cannot enter this comparison
    cfg = PipelineConfig(
        dataset_name="synthOracle",
        fore=ForegroundConfig(patch_size=PATCH, max_boxes_per_frame=8),
        model=CompletionConfig(
            nf=4, epochs=2, batch_size=20, context_of_num=0, use_flow=False,
        ),
    )
    train_idx = VideoIndex(["t0", "t1"], ds.train_video_lengths)
    test_idx = VideoIndex(["s0", "s1"], ds.test_video_lengths)
    train_cubes = extract_cube_set(
        cfg, spec, train_idx, ds.train_frames, ds.train_boxes
    )
    test_cubes = extract_cube_set(
        cfg, spec, test_idx, ds.test_frames, ds.test_boxes,
        block_mode=cfg.fore.test_block_mode,
    )
    return ds, spec, cfg, train_idx, test_idx, train_cubes, test_cubes


def _transplanted_pair(cfg):
    """A reference net and our net holding identical weights."""
    ref_net = _load_ref_net(cfg.model.nf)
    sd = {
        k: np.array(v.numpy(), copy=True)  # snapshot: training mutates in place
        for k, v in ref_net.state_dict().items()
    }
    net = make_completion_net(cfg.model)
    variables = convert_completion_state_dict(sd, net)
    return ref_net, variables


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_extraction_parity(world):
    """Our fused device extraction vs the literal cv2 loop: same cubes in the
    same order, +-1 LSB from cv2's 11-bit fixed-point uint8 resize."""
    ds, spec, cfg, train_idx, _, train_cubes, _ = world
    ref_c, ref_f, ref_b = _ref_extract(ds.train_frames, train_idx, ds.train_boxes)
    assert train_cubes.size == ref_c.shape[0]
    np.testing.assert_array_equal(train_cubes.frame_ids, ref_f)
    np.testing.assert_allclose(train_cubes.boxes, ref_b, atol=1e-5)
    stacked = _stack_ref_cubes(ref_c)
    diff = np.abs(train_cubes.raw.astype(np.int32) - stacked.astype(np.int32))
    assert diff.max() <= 1, f"max LSB diff {diff.max()}"
    assert (diff > 0).mean() < 0.1, f"LSB mismatch rate {(diff > 0).mean()}"


def test_training_and_scoring_parity(world):
    """Same cubes, same init, same batch schedule: the trained models'
    per-cube training scores and test-cube scores must track the reference's
    within the Adam-divergence tolerance."""
    ds, spec, cfg, train_idx, test_idx, train_cubes, test_cubes = world
    n = train_cubes.size
    assert n % cfg.model.batch_size == 0, "fixture must avoid partial batches"

    ref_net, variables = _transplanted_pair(cfg)
    trainer = make_trainer(cfg)
    blk = trainer.fit_block(
        train_cubes.raw, None, seed=SEED,
        init_state=trainer.state_from_variables(variables),
    )

    inputs = _to_torch_inputs(train_cubes.raw)
    _ref_train(ref_net, inputs, cfg.model.epochs, cfg.model.batch_size, SEED)
    ref_train_scores = _ref_score(ref_net, inputs)

    # per-cube training scores (z-norm statistics source, test.py:300-302).
    # Measured divergence after 8 Adam steps: 0.12% max relative.
    np.testing.assert_allclose(
        blk.raw_scores, ref_train_scores, rtol=0.02, atol=1e-4
    )
    corr = np.corrcoef(blk.raw_scores, ref_train_scores)[0, 1]
    assert corr > 0.9999, f"training-score correlation {corr}"

    # test-cube scores through the SAME trained pair
    ours_test, _ = trainer.score_block(blk, test_cubes.raw, None)
    ref_test_scores = _ref_score(ref_net, _to_torch_inputs(test_cubes.raw))
    corr = np.corrcoef(ours_test, ref_test_scores)[0, 1]
    assert corr > 0.9999, f"test-score correlation {corr}"
    np.testing.assert_allclose(ours_test, ref_test_scores, rtol=0.02, atol=1e-4)


def test_full_recipe_auroc_parity(world):
    """Both sides run their own complete pipeline — extraction, training,
    scoring, z-norm fusion, frame aggregation, AUROC — from the same frames,
    boxes, init, and batch schedule (test.py:269-401 vs pipeline/score)."""
    ds, spec, cfg, train_idx, test_idx, train_cubes, test_cubes = world
    n_frames = test_idx.total_frames

    # ours
    ref_net, variables = _transplanted_pair(cfg)
    trainer = make_trainer(cfg)
    blk = trainer.fit_block(
        train_cubes.raw, None, seed=SEED,
        init_state=trainer.state_from_variables(variables),
    )
    model = VadModel(cfg=cfg, blocks={(0, 0, 0): blk})
    cube_scores = score_cubes(model, test_cubes, trainer=trainer)
    ours_frame = frame_level_scores(cube_scores, test_cubes, n_frames)
    ours_auroc = roc_auc_score(ours_frame, ds.test_labels)

    # reference recipe end-to-end (its own cv2 extraction)
    ref_tr_c, _, _ = _ref_extract(ds.train_frames, train_idx, ds.train_boxes)
    ref_inputs = _to_torch_inputs(_stack_ref_cubes(ref_tr_c))
    _ref_train(ref_net, ref_inputs, cfg.model.epochs, cfg.model.batch_size, SEED)
    tr_scores = _ref_score(ref_net, ref_inputs)
    mu, sd = tr_scores.mean(), tr_scores.std()

    ref_te_c, te_f, te_b = _ref_extract(ds.test_frames, test_idx, ds.test_boxes)
    te_scores = _ref_score(ref_net, _to_torch_inputs(_stack_ref_cubes(ref_te_c)))
    fused = cfg.model.w_raw * (te_scores - mu) / sd  # test.py:300-307
    ref_frame = frame_level_scores_ref(fused, te_f, te_b, n_frames)
    ref_auroc = roc_auc_score(ref_frame, ds.test_labels)

    assert abs(ours_auroc - ref_auroc) < 0.02, (ours_auroc, ref_auroc)
    # frame scores rank-correlate on frames that have cubes
    finite = (ours_frame > -99999) & (ref_frame > -99999)
    r_o = np.argsort(np.argsort(ours_frame[finite]))
    r_r = np.argsort(np.argsort(ref_frame[finite]))
    rho = np.corrcoef(r_o, r_r)[0, 1]
    assert rho > 0.97, f"frame-score rank correlation {rho}"


def frame_level_scores_ref(scores, frame_ids, boxes, n_frames):
    """The reference's mask-splat + max aggregation (test.py:350-358,389-396)
    computed literally per frame."""
    big = 100000.0
    out = np.full(n_frames, -big)
    for f in range(n_frames):
        mask = np.full((48, 64), -big)
        for m in np.nonzero(frame_ids == f)[0]:
            x0, x1 = int(np.ceil(boxes[m][0])), int(np.ceil(boxes[m][2]))
            y0, y1 = int(np.ceil(boxes[m][1])), int(np.ceil(boxes[m][3]))
            cur = np.full((48, 64), -big)
            cur[y0:y1, x0:x1] = scores[m]
            mask = np.maximum(mask, cur)
        out[f] = mask.max()
    return out
