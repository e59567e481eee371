"""`visualize` CLI: score-mask renders/overlays + flow color wheels.

The reference's visualization workflow is commented-out calls over its
torch-saved score_mask files (test.py:321-328, helper/
visualization_helper.py); here it is a subcommand over `test
--save-masks`'s score_masks.npy and `calc-flow`'s flow trees.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vec_vad_tpu.cli import main
from vec_vad_tpu.utils.flowviz import write_flo

BIG = 1e5


def _mask_stack():
    """3 frames: gradient-scored block, uniform block, all-floor."""
    masks = np.full((3, 12, 16), -BIG, np.float32)
    masks[0, 2:6, 3:9] = np.linspace(0.5, 4.0, 24).reshape(4, 6)
    masks[1, :4, :4] = 5.0
    return masks


def test_visualize_masks_and_overlay(tmp_path):
    masks = _mask_stack()
    np.save(tmp_path / "m.npy", masks)
    fr = tmp_path / "frames"
    fr.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(
            str(fr / f"{i:03d}.png"),
            rng.integers(0, 256, (12, 16, 3), dtype=np.uint8),
        )
    out = tmp_path / "viz"
    rc = main([
        "visualize", "--masks", str(tmp_path / "m.npy"),
        "--frames-root", str(fr), "--out", str(out),
    ])
    assert rc == 0
    names = sorted(os.listdir(out))
    assert [n for n in names if n.startswith("score_")] == [
        f"score_{i:06d}.png" for i in range(3)
    ]
    assert [n for n in names if n.startswith("overlay_")] == [
        f"overlay_{i:06d}.png" for i in range(3)
    ]
    g0 = cv2.imread(str(out / "score_000000.png"), cv2.IMREAD_GRAYSCALE)
    assert g0.shape == (12, 16)
    # gradient block spans the full 0..255 range; floor pixels are 0
    assert g0.max() == 255 and g0[0, 0] == 0
    # all-floor frame renders black
    g2 = cv2.imread(str(out / "score_000002.png"), cv2.IMREAD_GRAYSCALE)
    assert g2.max() == 0
    # overlay: uncovered pixels are the untouched frame, covered blend
    f0 = cv2.imread(str(fr / "000.png"))
    ov = cv2.imread(str(out / "overlay_000000.png"))
    np.testing.assert_array_equal(ov[8:, :], f0[8:, :])
    assert not np.array_equal(ov[2:6, 3:9], f0[2:6, 3:9])


def test_visualize_flow_dir_mixed_formats_and_limit(tmp_path):
    fdir = tmp_path / "flow" / "v01"
    fdir.mkdir(parents=True)
    flow = np.zeros((8, 10, 2), np.float32)
    flow[..., 0] = 2.0
    np.save(fdir / "000.npy", flow)
    write_flo(str(fdir / "001.flo"), -flow)
    np.save(fdir / "002.npy", flow * 0.5)
    out = tmp_path / "viz"
    rc = main([
        "visualize", "--flow-dir", str(tmp_path / "flow"),
        "--out", str(out), "--limit", "2",
    ])
    assert rc == 0
    names = sorted(os.listdir(out))
    assert len(names) == 2 and all(n.startswith("flow_") for n in names)
    img = cv2.imread(str(out / names[0]))
    assert img.shape == (8, 10, 3) and img.max() > 0
    # opposite flows color differently (wheel hue flips)
    img2 = cv2.imread(str(out / names[1]))
    assert not np.array_equal(img, img2)


def test_visualize_argument_validation(tmp_path):
    # nothing to render -> exit 2, no output dir spam
    assert main(["visualize", "--out", str(tmp_path / "o")]) == 2
    # wrong mask rank
    np.save(tmp_path / "bad.npy", np.zeros((4, 4), np.float32))
    with pytest.raises(ValueError):
        main([
            "visualize", "--masks", str(tmp_path / "bad.npy"),
            "--out", str(tmp_path / "o2"),
        ])
    # empty frames tree
    masks = _mask_stack()
    np.save(tmp_path / "m.npy", masks)
    (tmp_path / "nofr").mkdir()
    with pytest.raises(FileNotFoundError):
        main([
            "visualize", "--masks", str(tmp_path / "m.npy"),
            "--frames-root", str(tmp_path / "nofr"),
            "--out", str(tmp_path / "o3"),
        ])
