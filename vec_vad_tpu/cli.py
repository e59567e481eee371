"""Command-line interface.

    python -m vec_vad_tpu train      --config config.cfg --base .
    python -m vec_vad_tpu test       --config config.cfg --base .
    python -m vec_vad_tpu calc-flow  --config config.cfg --checkpoint ...
    python -m vec_vad_tpu extract-frames --video v.avi --out frames/
    python -m vec_vad_tpu bench

Replaces the reference's script entry points (train.py / test.py /
calc_optical_flow.py / raw_datasets/ShanghaiTech/extract_frames.py /
train_and_test.sh) with one CLI over the same INI config surface.
"""

from __future__ import annotations

import argparse
import os
import sys

from vec_vad_tpu.config import PipelineConfig, load_ini_config


def _load_cfg(args) -> PipelineConfig:
    if args.config:
        # an explicitly passed path must exist — silently training with
        # built-in defaults after a typo'd --config overwrites artifacts
        # with the wrong dataset/hyperparameters. (The no-flag convenience
        # fallback is handled below: args.config defaults to None.)
        if not os.path.exists(args.config):
            raise FileNotFoundError(f"--config {args.config} does not exist")
        cfg = load_ini_config(args.config)
    elif os.path.exists("config.cfg"):
        cfg = load_ini_config("config.cfg")
    else:
        cfg = PipelineConfig()
    if getattr(args, "dataset", None):
        cfg = cfg.replace(dataset_name=args.dataset)
    return cfg


def _add_common(p):
    p.add_argument(
        "--config", default=None,
        help="INI config path (default: ./config.cfg if present)",
    )
    p.add_argument("--base", default=".", help="base dir holding raw_datasets/")
    p.add_argument("--dataset", default=None, help="override dataset_name")


def cmd_train(args) -> int:
    from vec_vad_tpu.runner import run_train

    cfg = _load_cfg(args)
    model, path = run_train(
        cfg, args.base, seed=args.seed, log_every=args.log_every,
        resident=args.resident,
    )
    print(f"trained {len(model.blocks)} block model(s) -> {path}")
    return 0


def cmd_test(args) -> int:
    from vec_vad_tpu.runner import run_test

    cfg = _load_cfg(args)
    res = run_test(
        cfg, args.base, save_masks=args.save_masks,
        per_video_norm=args.per_video_norm,
        pixel_criterion=args.pixel_criterion,
        resident=args.resident,
    )
    if "pixel_auroc" in res:
        print(f"pixel-level AUROC (coverage 0.4): {res['pixel_auroc']:.4f}")
    if "auroc_per_scene" in res:
        for si, auc in sorted(res["auroc_per_scene"].items()):
            print(f"scene {si} frame-level AUROC: {auc:.4f}")
        print(f"average frame-level AUROC: {res['auroc']:.4f}")
    else:
        print(f"frame-level AUROC: {res['auroc']:.4f}")
    print(f"curves -> {res['results_path']}")
    return 0


def _build_live_flow(args):
    """FlowNet2 + variables for --live-flow (checkpoint or random).
    Returns (net, variables, scorer_kwargs) — kwargs carry the
    --flow-dtype knob (bf16 forward: ~9% latency, half the flow-weight
    HBM; scores shift by bf16 rounding, PROFILE.md §6)."""
    import jax
    import jax.numpy as jnp

    from vec_vad_tpu.models.flownet import FlowNet2, load_flownet2_checkpoint

    fnet = FlowNet2()
    x0 = jnp.zeros((1, 2, 384, 512, 3))
    if args.flow_checkpoint:
        fvars, report = load_flownet2_checkpoint(fnet, x0, args.flow_checkpoint)
        print(f"loaded flow checkpoint: {len(report['matched'])} tensors")
    else:
        fvars = fnet.init(jax.random.key(0), x0)
        print("WARNING: no --flow-checkpoint — random-init FlowNet2")
    fdt = (
        jnp.bfloat16
        if getattr(args, "flow_dtype", "float32") == "bfloat16"
        else jnp.float32
    )
    return fnet, fvars, {"flow_compute_dtype": fdt}


def _serve_fleet(cfg, model, data, args, live: bool) -> int:
    """`serve --cameras C`: every camera streams the test split's first
    video in lockstep (one fused device call per tick). Identical
    per-camera inputs double as an on-hardware cross-camera consistency
    check; reports per-tick latency and aggregate fleet fps."""
    import time

    import numpy as np

    C = int(args.cameras)
    ln = int(data.index.video_lengths[0])
    n = ln if args.frames <= 0 else min(args.frames, ln)

    if live:
        from vec_vad_tpu.serve import MultiCameraFlowScorer

        fnet, fvars, fkw = _build_live_flow(args)
        scorer = MultiCameraFlowScorer.from_model(
            model, n_cameras=C, flow_net=fnet, flow_variables=fvars, **fkw
        )
    else:
        from vec_vad_tpu.serve import MultiCameraScorer

        scorer = MultiCameraScorer.from_model(model, n_cameras=C)

    # scene routing: default = the first test video's scene row (multi-
    # scene grids would mis-route through scene 1 otherwise — same rule
    # as the single path); --camera-scenes assigns each camera its own
    # scene row (the reference's test.py:282 model_set[scene_idx-1]
    # semantics, per camera)
    scene_idx = data.index.scene_idx
    default_scene = int(scene_idx[0]) if scene_idx is not None else 1
    spec = getattr(args, "camera_scenes", None)
    if spec:
        scenes = [int(s) for s in str(spec).split(",")]
        if len(scenes) == 1:
            scenes = scenes * C
        if len(scenes) != C:
            raise SystemExit(
                f"--camera-scenes needs {C} values (or one), got {len(scenes)}"
            )
    else:
        scenes = [default_scene] * C
    if live:
        # the live fleet shares video boundaries; start_video takes the
        # per-camera scene vector directly
        scorer.start_video(scene=scenes)
    else:
        for c, s in enumerate(scenes):
            scorer.start_video(camera=c, scene=s)
    rows, lat = [], []
    for t in range(n):
        frame = np.asarray(data.frames[t])
        frames = np.broadcast_to(frame, (C,) + frame.shape)
        boxes = [data.boxes[t]] * C
        t0 = time.perf_counter()
        if live:
            out = scorer.push_tick(frames, boxes)
        else:
            flow = (
                np.asarray(data.flow[t])
                if scorer.use_flow and data.flow is not None
                else None
            )
            flows = (
                np.broadcast_to(flow, (C,) + flow.shape)
                if flow is not None else None
            )
            out = scorer.push_tick(frames, boxes, flows=flows)
        lat.append(time.perf_counter() - t0)
        if out is not None:
            rows.append(out)
    if live:
        out = scorer.end_video()
        if out is not None:
            rows.append(out)
    rows.extend(scorer.drain())
    lat = np.array(lat[2:]) if len(lat) > 2 else np.array(lat)
    med = float(np.median(lat)) * 1e3
    rows = np.asarray(rows, np.float32)
    spread = float(np.max(np.abs(rows - rows[:, :1]))) if rows.size else 0.0
    print(
        f"fleet of {C} cameras, {len(lat)} timed ticks: median "
        f"{med:.1f} ms/tick = {C * 1000.0 / max(med, 1e-9):.1f} fps "
        f"aggregate; cross-camera score spread {spread:.2e}"
    )
    return 0


def cmd_serve(args) -> int:
    """Online serving demo/driver: stream the test split frame-by-frame
    through serve.StreamingScorer (one device call per frame) and report
    steady-state latency, plus the streamed AUROC when the whole split is
    scored (equal to offline `test` by construction, test_serve.py)."""
    import time

    import numpy as np

    from vec_vad_tpu.runner import load_split
    from vec_vad_tpu.runtime.artifacts import load_vad_model
    from vec_vad_tpu.serve import StreamingScorer

    cfg = _load_cfg(args)
    model_path = os.path.join(
        args.base, cfg.data_root_dir, cfg.modality,
        f"{cfg.dataset_name}_model_{cfg.fore.extraction_mode}_{cfg.method}.npz",
    )
    model = load_vad_model(model_path)
    data = load_split(cfg, args.base, "test")
    live = bool(getattr(args, "live_flow", False))
    motion = bool(getattr(args, "motion", False))
    if live and not cfg.model.use_flow:
        # fail BEFORE the expensive FlowNet2 build/checkpoint load
        raise SystemExit(
            "--live-flow needs a two-stream model (useFlow=True); "
            "this config is raw-only"
        )
    if motion and int(getattr(args, "cameras", 1)) > 1:
        raise SystemExit(
            "--motion composes with single-camera serving only "
            "(not --cameras)"
        )
    if int(getattr(args, "cameras", 1)) > 1:
        return _serve_fleet(cfg, model, data, args, live)
    if live and motion:
        # fully self-contained: boxes AND flow computed in the loop
        from vec_vad_tpu.serve import MotionFlowStreamingScorer

        fnet, fvars, fkw = _build_live_flow(args)
        scorer = MotionFlowStreamingScorer.from_model(
            model, spec=cfg.dataset, flow_net=fnet, flow_variables=fvars,
            **fkw,
        )
    elif live:
        from vec_vad_tpu.serve import FlowStreamingScorer

        fnet, fvars, fkw = _build_live_flow(args)
        scorer = FlowStreamingScorer.from_model(
            model, flow_net=fnet, flow_variables=fvars, **fkw
        )
    elif motion:
        from vec_vad_tpu.serve import MotionStreamingScorer

        scorer = MotionStreamingScorer.from_model(model, spec=cfg.dataset)
    else:
        scorer = StreamingScorer.from_model(model)

    n = data.index.total_frames if args.frames <= 0 else min(
        args.frames, data.index.total_frames
    )
    scores, lat = [], []
    i = 0
    scene_idx = data.index.scene_idx
    for ln in data.index.video_lengths:
        if i >= n:
            break
        # route each video through its own scene's block row (all-ones for
        # the stock datasets; real multi-scene grids would mis-route through
        # scene 1 otherwise — the offline path routes per-frame the same way)
        scorer.start_video(
            scene=int(scene_idx[i]) if scene_idx is not None else 1
        )
        for _ in range(int(ln)):
            if i >= n:
                break
            frame = np.asarray(data.frames[i])
            t0 = time.perf_counter()
            if live and motion:
                s = scorer.push(frame)  # boxes AND flow computed in-loop
            elif live:
                s = scorer.push(frame, data.boxes[i])
            else:
                flow = (
                    np.asarray(data.flow[i])
                    if scorer.use_flow and data.flow is not None
                    else None
                )
                if motion:
                    s = scorer.push(frame, flow=flow)
                else:
                    s = scorer.push(frame, data.boxes[i], flow=flow)
            lat.append(time.perf_counter() - t0)
            if s is not None:
                scores.append(s)
            i += 1
        if motion:
            scores.extend(scorer.end_video())
        elif live:
            s = scorer.end_video()
            if s is not None:
                scores.append(s)
    scores.extend(scorer.drain())
    lat = np.array(lat[2:]) if len(lat) > 2 else np.array(lat)  # drop compiles
    print(
        f"streamed {i} frames: median latency {np.median(lat) * 1e3:.1f} ms "
        f"({1.0 / max(np.median(lat), 1e-9):.1f} fps steady-state)"
    )
    if args.frames <= 0 and len(scores) == data.index.total_frames:
        from vec_vad_tpu.data.readers import load_frame_labels
        from vec_vad_tpu.eval.metrics import evaluate_scores

        root = os.path.join(args.base, cfg.raw_dataset_dir, cfg.dataset_name)
        labels = load_frame_labels(cfg.dataset_name, root, data.index)
        print(
            "frame-level AUROC (streamed): "
            f"{evaluate_scores(np.array(scores), labels).roc_auc:.4f}"
        )
    return 0


def cmd_export_torch(args) -> int:
    """Export the trained model grid to the reference's torch artifact
    set (model_set + raw/of training-score grids, train.py:432-436
    naming/format) so the unmodified reference test.py can score with a
    model trained here (completion_export.py; reverse of the released-
    checkpoint importer)."""
    from vec_vad_tpu.models.completion_export import export_model_grid
    from vec_vad_tpu.runtime.artifacts import load_vad_model

    cfg = _load_cfg(args)
    model_path = os.path.join(
        args.base, cfg.data_root_dir, cfg.modality,
        f"{cfg.dataset_name}_model_{cfg.fore.extraction_mode}_{cfg.method}.npz",
    )
    model = load_vad_model(model_path)
    out = args.out or os.path.dirname(model_path)
    for p in export_model_grid(
        model, out, mode=cfg.fore.extraction_mode, method=cfg.method
    ):
        print(p)
    return 0


def cmd_import_torch(args) -> int:
    """Import a released reference checkpoint set (model_set +
    raw/of training-score grids, README.md:63 e.g.
    avenue_model_5raw1of_auc0.902) into the .npz VadModel the `test`
    subcommand loads — the inverse of `export-torch`."""
    from vec_vad_tpu.models.completion_convert import import_model_grid
    from vec_vad_tpu.runtime.artifacts import save_vad_model

    cfg = _load_cfg(args)
    model = import_model_grid(cfg, args.model_dir)
    out = args.out or os.path.join(
        args.base, cfg.data_root_dir, cfg.modality,
        f"{cfg.dataset_name}_model_{cfg.fore.extraction_mode}_{cfg.method}.npz",
    )
    if os.path.dirname(out):
        os.makedirs(os.path.dirname(out), exist_ok=True)
    save_vad_model(out, model)
    print(f"imported {len(model.blocks)} block(s) -> {out}")
    return 0


def cmd_demo(args) -> int:
    import importlib.util

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "synthetic_e2e.py",
    )
    if not os.path.exists(path):
        # site-packages install: examples/ ships with the checkout
        print(
            "examples/synthetic_e2e.py not found next to the package — "
            "run `vec-vad demo` from a source checkout (pip install -e .)",
            file=sys.stderr,
        )
        return 2
    spec = importlib.util.spec_from_file_location("synthetic_e2e", path)
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)
    return demo.main()


def cmd_visualize(args) -> int:
    """Render persisted artifacts to images: per-frame anomaly-score masks
    (grayscale + optional frame overlay) and optical-flow color wheels.

    The reference ships this workflow as commented-out calls
    (test.py:321-328 `visualize_score`/`visualize_pair_map`, flowlib's
    `show_flow`) over its torch-saved score_mask/<idx> files; here the
    artifacts are `test --save-masks`'s score_masks.npy and `calc-flow`'s
    .npy/.flo trees, and the renderer is a first-class subcommand."""
    import glob as _glob

    import cv2
    import numpy as np

    from vec_vad_tpu.utils.flowviz import flow_to_image, read_flo
    from vec_vad_tpu.utils.visualize import score_mask_overlay, visualize_score

    if not (args.masks or args.flow_dir):
        print("nothing to do: pass --masks and/or --flow-dir", file=sys.stderr)
        return 2
    os.makedirs(args.out, exist_ok=True)
    wrote = 0
    if args.masks:
        masks = np.load(args.masks)
        if masks.ndim != 3:
            raise ValueError(
                f"--masks expects (N, H, W) score_masks.npy, got {masks.shape}"
            )
        frames = []
        if args.frames_root:
            pats = ("*.jpg", "*.jpeg", "*.png", "*.bmp", "*.tif", "*.tiff")
            for pat in pats:
                frames += _glob.glob(
                    os.path.join(args.frames_root, "**", pat), recursive=True
                )
            frames.sort()
            if not frames:
                raise FileNotFoundError(
                    f"--frames-root {args.frames_root}: no images found"
                )
        n = masks.shape[0] if args.limit is None else min(
            masks.shape[0], args.limit
        )
        for i in range(n):
            cv2.imwrite(
                os.path.join(args.out, f"score_{i:06d}.png"),
                visualize_score(masks[i]),
            )
            wrote += 1
            if frames and i < len(frames):
                frame = cv2.imread(frames[i], cv2.IMREAD_COLOR)
                cv2.imwrite(
                    os.path.join(args.out, f"overlay_{i:06d}.png"),
                    score_mask_overlay(frame, masks[i], alpha=args.alpha),
                )
                wrote += 1
    if args.flow_dir:
        paths = sorted(
            _glob.glob(os.path.join(args.flow_dir, "**", "*.npy"), recursive=True)
            + _glob.glob(os.path.join(args.flow_dir, "**", "*.flo"), recursive=True)
        )
        if args.limit is not None:
            paths = paths[: args.limit]
        if not paths:
            raise FileNotFoundError(f"--flow-dir {args.flow_dir}: no .npy/.flo")
        for p in paths:
            flow = read_flo(p) if p.endswith(".flo") else np.load(p)
            rel = os.path.relpath(p, args.flow_dir)
            out = os.path.join(
                args.out, "flow_" + rel.replace(os.sep, "_") + ".png"
            )
            # flow_to_image returns RGB (flowlib convention); cv2 writes BGR
            cv2.imwrite(out, flow_to_image(flow)[:, :, ::-1])
            wrote += 1
    print(f"wrote {wrote} image(s) -> {args.out}")
    return 0


def cmd_calc_flow(args) -> int:
    from vec_vad_tpu.runner import run_calc_flow

    cfg = _load_cfg(args)
    splits = tuple(args.splits.split(","))
    run_calc_flow(
        cfg, args.base, checkpoint=args.checkpoint, splits=splits,
        resident=args.resident, segment_frames=args.segment_frames or None,
        chunk=args.chunk or None, flow_dtype=args.flow_dtype,
        use_mesh=not args.no_mesh,
    )
    return 0


_FLOW_COMPOSITES = {"FlowNet2", "FlowNet2CS", "FlowNet2CSS"}


def _make_flow_net(name: str):
    """Build a flow net for the training/inference harness: component
    nets take the datasets' (B,H,W,6) batches directly; the composites
    get the PairMajorAdapter wrap (they take (B,2,H,W,3) and return one
    fused flow)."""
    from vec_vad_tpu.flow.trainer import PairMajorAdapter
    from vec_vad_tpu.models import flownet

    inner = getattr(flownet, name)()
    return PairMajorAdapter(inner=inner) if name in _FLOW_COMPOSITES else inner


def _load_flow_torch_checkpoint(net, name: str, hw, path: str):
    """Torch checkpoint -> params for a _make_flow_net net (composites:
    load into the bare composite whose tree matches the torch key space,
    then nest under the adapter's 'inner' scope)."""
    import jax.numpy as jnp

    from vec_vad_tpu.models.flownet import load_flownet2_checkpoint

    th, tw = hw
    if name in _FLOW_COMPOSITES:
        variables, report = load_flownet2_checkpoint(
            net.inner, jnp.zeros((1, 2, th, tw, 3)), path
        )
        return {"inner": variables["params"]}, report
    variables, report = load_flownet2_checkpoint(
        net, jnp.zeros((1, th, tw, 6)), path
    )
    return variables["params"], report


_FLOW_DATASETS = (
    "MpiSintel", "FlyingChairs", "ChairsSDHom",
    "FlyingThingsClean", "FlyingThingsFinal", "ImagesFromFolder",
)


def _flow_dataset_makers(args):
    """dataset-name -> constructor(root, **kw) for the flow harness CLI —
    the reference's main.py dataset registry (FlowNet2_src/main.py:119-134
    resolves `--training_dataset`/`--inference_dataset` against the
    datasets module's class names)."""
    from vec_vad_tpu.flow import datasets as fds

    return {
        "MpiSintel": lambda root, **kw: fds.MpiSintel(
            root, dstype=args.dstype, **kw
        ),
        "FlyingChairs": fds.FlyingChairs,
        "ChairsSDHom": fds.ChairsSDHom,
        "FlyingThingsClean": fds.FlyingThingsClean,
        "FlyingThingsFinal": fds.FlyingThingsFinal,
        "ImagesFromFolder": lambda root, **kw: fds.ImagesFromFolder(
            root, iext=args.iext, **kw
        ),
    }


def cmd_flow_train(args) -> int:
    """Fine-tune a flow net on Sintel/FlyingChairs/ChairsSDHom/
    FlyingThings trees — the reference's FlowNet2_src/main.py harness as
    a CLI: epoch loop with per-epoch validation EPE, resumable checkpoint
    + model_best tracking (flow/harness.py), StaticRandomCrop
    augmentation and /64 render-size handling (flow/datasets.py),
    multi-scale L1/L2 loss, stepped LR schedule."""
    from vec_vad_tpu.flow.harness import FlowHarness
    from vec_vad_tpu.flow.trainer import FlowTrainer

    # component nets (FlowNetC/S/SD) return a multi-scale pyramid in train
    # mode and pair with the MultiScale loss; the FlowNet2/CS/CSS
    # composites return ONE fused flow and the reference trains them with
    # single-scale L1Loss/L2Loss on it (main.py:194-197, losses.py:22-45)
    components = {"FlowNetC", "FlowNetS", "FlowNetSD"}
    composites = _FLOW_COMPOSITES
    if args.net in components:
        if args.loss != "multiscale":
            raise SystemExit(
                f"--net {args.net} returns a flow pyramid in train mode; "
                "train it with --loss multiscale (--norm picks L1/L2)."
            )
        loss_mode, norm = "multiscale", args.norm
    elif args.net in composites:
        if args.loss == "multiscale":
            raise SystemExit(
                f"--net {args.net} returns one fused flow — the pyramid "
                "loss cannot supervise it. Pass --loss L1 or --loss L2 "
                "(the reference's composite recipe, main.py:194-197)."
            )
        loss_mode, norm = "single", args.loss
    else:
        raise SystemExit(f"unknown --net {args.net!r}")
    net = _make_flow_net(args.net)

    crop = (
        tuple(int(v) for v in args.crop_size.split(","))
        if args.crop_size else None
    )
    if args.dataset == "ImagesFromFolder":
        # zero ground-truth flow (datasets.py ImagesFromFolder) — training
        # against it would teach the net to predict zeros
        raise SystemExit(
            "ImagesFromFolder has no ground-truth flow; it is a "
            "flow-infer dataset only."
        )
    mk = _flow_dataset_makers(args)[args.dataset]
    train_ds = mk(args.data_root, crop_size=crop)
    # validation center-crops to the render size (no augmentation),
    # main.py's is_cropped=False eval path
    val_ds = mk(args.val_root or args.data_root)

    init_params = None
    trainer = FlowTrainer(
        net,
        learning_rate=args.lr,
        norm=norm,
        loss=loss_mode,
        schedule_lr_frequency=args.schedule_lr_frequency,
        schedule_lr_fraction=args.schedule_lr_fraction,
    )
    if args.checkpoint:
        hw = train_ds.crop_size or train_ds.render_size
        init_params, report = _load_flow_torch_checkpoint(
            net, args.net, hw, args.checkpoint
        )
        print(f"loaded checkpoint: {len(report['matched'])} tensors")

    harness = FlowHarness(trainer, args.workdir, norm=norm)
    result = harness.fit(
        train_ds,
        val_ds,
        total_epochs=args.epochs,
        batch_size=args.batch_size,
        seed=args.seed,
        resume=not args.no_resume,
        log=True,
        init_params=init_params,
    )
    print(f"best validation EPE: {result.best_epe:.4f}")
    print(f"checkpoints in {args.workdir}")
    return 0


def cmd_flow_infer(args) -> int:
    """The reference harness's --inference mode (main.py:87-100,344-352,
    524-589): run a trained/converted flow net over a flow-dataset tree,
    optionally write each prediction as %06d.flo, and report mean EPE.
    Weights come from --checkpoint (torch .pth) or from --workdir
    (a flow-train run's model_best/checkpoint msgpack); like the
    reference, inference without weights refuses to run."""
    from vec_vad_tpu.flow.harness import FlowHarness
    from vec_vad_tpu.flow.trainer import FlowTrainer

    net = _make_flow_net(args.net)
    ds = _flow_dataset_makers(args)[args.dataset](args.data_root)

    trainer = FlowTrainer(net)
    workdir = args.workdir or os.path.join(args.out or ".", "_flow_infer")
    harness = FlowHarness(trainer, workdir)
    pairs0, _ = next(ds.batches(args.batch_size, shuffle=False))

    params = None
    if args.checkpoint:
        params, report = _load_flow_torch_checkpoint(
            net, args.net, pairs0.shape[1:3], args.checkpoint
        )
        print(f"loaded torch checkpoint: {len(report['matched'])} tensors")
    elif args.workdir:
        template = trainer.init_state(pairs0[:1], seed=0)
        loaded = harness.load_checkpoint(template, best=True)
        if loaded is None:
            loaded = harness.load_checkpoint(template)
        if loaded is not None:
            params = loaded[0].params
            print(f"loaded {args.workdir} checkpoint (epoch {loaded[1]})")
    if params is None:
        # main.py:352-354 quits on inference without a resumable checkpoint
        raise SystemExit(
            "flow-infer needs weights: pass --checkpoint (torch) or "
            "--workdir holding a flow-train checkpoint"
        )

    save_dir = None
    if args.save_flow:
        save_dir = args.out or os.path.join(workdir, "inference")
    res = harness.infer(
        params, ds, args.batch_size, save_dir=save_dir,
        n_batches=args.n_batches,
    )
    if getattr(ds, "has_ground_truth", True):
        print(f"inference EPE over {res['n']} samples: {res['epe']:.4f}")
    else:
        # zero-GT dataset: the 'EPE' is the mean predicted-flow norm,
        # exactly what the reference's inference loop reports there
        print(
            f"mean predicted-flow norm over {res['n']} samples "
            f"(no ground truth): {res['epe']:.4f}"
        )
    if save_dir:
        print(f"flows written to {save_dir}")
    return 0


def cmd_precompute_boxes(args) -> int:
    from vec_vad_tpu.runner import run_precompute_boxes

    cfg = _load_cfg(args)
    run_precompute_boxes(
        cfg, args.base, splits=tuple(args.splits.split(",")),
        overwrite=args.overwrite,
    )
    return 0


def cmd_extract_frames(args) -> int:
    """Video file -> %06d.jpg frames
    (raw_datasets/ShanghaiTech/extract_frames.py equivalent)."""
    import cv2

    os.makedirs(args.out, exist_ok=True)
    cap = cv2.VideoCapture(args.video)
    if not cap.isOpened():
        print(f"cannot open {args.video}", file=sys.stderr)
        return 1
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        i += 1
        cv2.imwrite(os.path.join(args.out, f"{i:06d}.jpg"), frame)
    cap.release()
    print(f"extracted {i} frames to {args.out}")
    return 0


def cmd_bench(args) -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.exists(os.path.join(root, "bench.py")):
        # site-packages install: the benchmark harness ships with the
        # checkout (repo root), not the wheel
        print(
            "bench.py not found next to the package — run `vec-vad bench` "
            "from a source checkout (pip install -e .)",
            file=sys.stderr,
        )
        return 2
    sys.path.insert(0, root)
    import bench

    bench.main()
    return 0


def main(argv=None) -> int:
    # persistent executable cache: repeat CLI runs skip TPU recompiles
    # (big compiles on the reference backend run minutes; see runtime/)
    from vec_vad_tpu.runtime import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    ap = argparse.ArgumentParser(prog="vec_vad_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="train the completion-model grid")
    _add_common(p)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=5)
    p.add_argument(
        "--resident", action="store_true",
        help="device-resident extraction (cubes never leave HBM; "
        "skips the on-disk cube cache)",
    )
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("test", help="score the test split + AUROC")
    _add_common(p)
    p.add_argument("--save-masks", action="store_true")
    p.add_argument("--per-video-norm", action="store_true")
    p.add_argument(
        "--pixel-criterion", action="store_true",
        help="also evaluate the pixel-level coverage criterion "
        "(needs pixel GT masks)",
    )
    p.add_argument(
        "--resident", action="store_true",
        help="device-resident test extraction (cubes stay in HBM for "
        "scoring; skips the on-disk cube cache)",
    )
    p.set_defaults(fn=cmd_test)

    p = sub.add_parser(
        "serve",
        help="online streaming scorer over the test split "
        "(one device call per frame)",
    )
    _add_common(p)
    p.add_argument(
        "--frames", type=int, default=0,
        help="stream only the first N frames (0 = whole split + AUROC)",
    )
    p.add_argument(
        "--live-flow", action="store_true",
        help="compute optical flow ON DEVICE inside the per-frame call "
        "(no precomputed flow tree needed; two-stream models only)",
    )
    p.add_argument(
        "--cameras", type=int, default=1,
        help="fleet mode: C cameras stream the first test video in "
        "lockstep, one device call per tick (MultiCameraScorer)",
    )
    p.add_argument(
        "--flow-checkpoint", default=None,
        help="FlowNet2 torch checkpoint for --live-flow "
        "(random-init with a warning when absent)",
    )
    p.add_argument(
        "--camera-scenes", default=None,
        help="fleet mode: comma-separated per-camera scene rows "
        "(len --cameras, or one value for all; default: the first test "
        "video's scene) — each camera scores against its scene's blocks",
    )
    p.add_argument(
        "--motion", action="store_true",
        help="compute foreground boxes IN the serving loop from the "
        "frame stream (the reference's motion-detector recipe) instead "
        "of using the workspace's bbox source (MotionStreamingScorer)",
    )
    p.add_argument(
        "--flow-dtype", choices=("float32", "bfloat16"), default="float32",
        help="--live-flow FlowNet forward dtype: bfloat16 is ~9%% faster "
        "per frame and halves flow-weight HBM (scores shift by bf16 "
        "rounding)",
    )
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("demo", help="end-to-end demo on a synthetic dataset")
    p.set_defaults(fn=cmd_demo)

    p = sub.add_parser(
        "visualize",
        help="render score masks / flow maps to images "
        "(test --save-masks + calc-flow artifacts)",
    )
    p.add_argument(
        "--masks", default=None,
        help="score_masks.npy from `test --save-masks` -> per-frame "
        "grayscale score_%%06d.png",
    )
    p.add_argument(
        "--frames-root", default=None,
        help="image tree matched 1:1 (sorted) with --masks frames -> "
        "JET overlay_%%06d.png",
    )
    p.add_argument(
        "--flow-dir", default=None,
        help="tree of .npy/.flo flow maps -> Middlebury color-wheel pngs",
    )
    p.add_argument("--out", required=True, help="output image directory")
    p.add_argument("--limit", type=int, default=None, help="cap frames/maps")
    p.add_argument(
        "--alpha", type=float, default=0.5,
        help="overlay heatmap opacity on scored pixels",
    )
    p.set_defaults(fn=cmd_visualize)

    p = sub.add_parser("calc-flow", help="precompute FlowNet2 optical flow")
    _add_common(p)
    p.add_argument("--checkpoint", default=None, help="FlowNet2 .pth(.tar)")
    p.add_argument("--splits", default="train,test")
    p.add_argument(
        "--resident", action="store_true",
        help="whole-split flow in one device call (HBM-resident)",
    )
    p.add_argument(
        "--segment-frames", type=int, default=0,
        help="force the memory-bounded segmented path with this segment "
        "size (0 = auto-route by footprint; oversized splits stream)",
    )
    p.add_argument(
        "--flow-dtype", choices=("float32", "bfloat16"), default="float32",
        help="FlowNet forward dtype (.npy output is always f32); "
        "bfloat16 is 2.1x maps/s on TPU at the 384x512 protocol but "
        "shifts flow values by bf16 rounding",
    )
    p.add_argument(
        "--chunk", type=int, default=0,
        help="frame pairs per FlowNet batch (0 = per-dtype optimum: "
        "4 f32, 8 bf16)",
    )
    p.add_argument(
        "--no-mesh", action="store_true",
        help="disable the automatic data-parallel pair sharding over "
        "multi-device meshes (outputs are identical either way)",
    )
    p.set_defaults(fn=cmd_calc_flow)

    p = sub.add_parser(
        "precompute-boxes",
        help="generate bboxes_{split}_{mode}.npy fixtures (the reference's "
             "fore_det precomputation; uses mmdet_checkpoint if configured)",
    )
    _add_common(p)
    p.add_argument("--splits", default="train,test")
    p.add_argument("--overwrite", action="store_true")
    p.set_defaults(fn=cmd_precompute_boxes)

    p = sub.add_parser(
        "flow-train",
        help="fine-tune a flow net (FlowNet2_src/main.py harness: "
        "epochs, validation EPE, resume, model_best)",
    )
    p.add_argument("--data-root", required=True)
    p.add_argument("--val-root", default=None,
                   help="validation tree (default: --data-root)")
    p.add_argument(
        "--dataset", default="FlyingChairs",
        choices=[d for d in _FLOW_DATASETS if d != "ImagesFromFolder"],
    )
    p.add_argument("--dstype", default="clean",
                   help="MpiSintel pass: clean | final")
    p.add_argument(
        "--net", default="FlowNetS",
        choices=["FlowNetC", "FlowNetS", "FlowNetSD",
                 "FlowNet2", "FlowNet2CS", "FlowNet2CSS"],
    )
    p.add_argument("--workdir", required=True,
                   help="checkpoint/model_best directory")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--norm", default="L1", choices=["L1", "L2"],
                   help="norm inside the multiscale loss")
    p.add_argument(
        "--loss", default="multiscale", choices=["multiscale", "L1", "L2"],
        help="multiscale for component nets; L1/L2 single-scale on the "
        "fused output for the FlowNet2/CS/CSS composites "
        "(the reference's main.py:194-197 recipe)",
    )
    p.add_argument("--crop-size", default=None,
                   help="h,w StaticRandomCrop augmentation")
    p.add_argument("--schedule-lr-frequency", type=int, default=0)
    p.add_argument("--schedule-lr-fraction", type=float, default=10.0)
    p.add_argument("--checkpoint", default=None,
                   help="torch checkpoint to fine-tune from")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-resume", action="store_true")
    p.set_defaults(fn=cmd_flow_train)

    p = sub.add_parser(
        "flow-infer",
        help="run a flow net over a flow dataset, optionally saving .flo "
        "predictions, and report EPE (the reference's --inference mode)",
    )
    p.add_argument("--data-root", required=True)
    p.add_argument(
        "--dataset", default="FlyingChairs",
        choices=list(_FLOW_DATASETS),
    )
    p.add_argument("--dstype", default="clean",
                   help="MpiSintel pass: clean | final")
    p.add_argument("--iext", default="png",
                   help="ImagesFromFolder frame extension (png/jpg/...)")
    p.add_argument(
        "--net", default="FlowNet2",
        choices=["FlowNetC", "FlowNetS", "FlowNetSD",
                 "FlowNet2", "FlowNet2CS", "FlowNet2CSS"],
    )
    p.add_argument("--checkpoint", default=None,
                   help="torch .pth(.tar) weights")
    p.add_argument("--workdir", default=None,
                   help="flow-train workdir to load model_best from")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--n-batches", type=int, default=-1,
                   help="stop after N batches (-1 = whole dataset)")
    p.add_argument("--save-flow", action="store_true",
                   help="write each prediction as %%06d.flo")
    p.add_argument("--out", default=None,
                   help="directory for saved flows (default: "
                   "<workdir>/inference)")
    p.set_defaults(fn=cmd_flow_infer)

    p = sub.add_parser(
        "export-torch",
        help="export the trained model grid to the reference's torch "
        "artifact format (model_set + training-score grids)",
    )
    _add_common(p)
    p.add_argument(
        "--out", default=None,
        help="output directory (default: alongside the .npz model)",
    )
    p.set_defaults(fn=cmd_export_torch)

    p = sub.add_parser(
        "import-torch",
        help="import a released reference checkpoint set (model_set + "
        "training-score grids) into the .npz model `test` loads",
    )
    _add_common(p)
    p.add_argument(
        "--model-dir", required=True,
        help="directory holding <ds>_model_<mode>_<method>.npy + the "
        "raw/of training-score files (the reference's data/raw2flow)",
    )
    p.add_argument(
        "--out", default=None,
        help="output .npz path (default: the canonical model path under "
        "--base, where `test` looks)",
    )
    p.set_defaults(fn=cmd_import_torch)

    p = sub.add_parser("extract-frames", help="video file -> frame images")
    p.add_argument("--video", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_extract_frames)

    p = sub.add_parser("bench", help="run the TPU inference benchmark")
    p.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
