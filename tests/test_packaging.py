"""Packaging surface: pyproject metadata, console entry point, native-dir
override.

The reference is a clone-and-run script repo (train_and_test.sh); the
framework is installable (`pip install -e .` -> `vec-vad`). These tests pin
the metadata without running pip (no network in CI images): the TOML must
parse, the declared entry point must resolve to a real callable, the
version must match the package, and every runtime dependency actually
imported by the package must be declared.
"""

import importlib
import os
import tomllib

import vec_vad_tpu
from vec_vad_tpu.runtime import native_loader

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_pyproject():
    with open(os.path.join(_ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_pyproject_parses_and_version_in_sync():
    meta = _load_pyproject()["project"]
    assert meta["name"] == "vec-vad-tpu"
    assert meta["version"] == vec_vad_tpu.__version__


def test_console_script_resolves():
    meta = _load_pyproject()["project"]
    target = meta["scripts"]["vec-vad"]
    mod_name, attr = target.split(":")
    fn = getattr(importlib.import_module(mod_name), attr)
    assert callable(fn)
    # argparse exits 0 on --help; the entry point must be the real CLI
    try:
        fn(["--help"])
    except SystemExit as e:
        assert e.code == 0


def test_runtime_deps_declared():
    """Every third-party module the package imports at runtime appears in
    [project.dependencies] (torch is the declared interop extra)."""
    meta = _load_pyproject()["project"]
    deps = " ".join(meta["dependencies"])
    for mod, pkg in [
        ("jax", "jax"),
        ("flax", "flax"),
        ("optax", "optax"),
        ("numpy", "numpy"),
        ("cv2", "opencv"),
        ("scipy", "scipy"),
    ]:
        assert pkg in deps, f"{mod} used by the package but {pkg} undeclared"
    extras = meta["optional-dependencies"]
    assert any("torch" in d for d in extras["interop"])


def test_native_dir_env_override(monkeypatch, tmp_path):
    monkeypatch.setenv("VEC_VAD_NATIVE_DIR", str(tmp_path))
    assert native_loader.native_dir() == str(tmp_path)
    assert native_loader._so_path() == str(tmp_path / "libvadio.so")
    # empty override dir has no Makefile: build fails cleanly, no raise
    assert native_loader.build_native(force=True) is False
    monkeypatch.delenv("VEC_VAD_NATIVE_DIR")
    assert native_loader.native_dir().endswith(os.sep + "native")
