"""Regression gate for the silent-NaN gather bug class.

jnp.take / jnp.take_along_axis default to mode=None == 'fill', which fills
out-of-bounds reads with NaN for float dtypes under jit. Round 3 shipped a
real bug from exactly this (an unclamped gather into a 1-row dummy flow
buffer silently trained the flow UNet to NaN; fixed in commit b809e11).
This test turns the "audit any new gather" convention into a mechanical
gate: every jnp.take/take_along_axis call site in the package must carry an
explicit mode= keyword (normally "clip", matching the host-side index
clamping every proven-safe site already does).
"""

import ast
import pathlib

import vec_vad_tpu

PKG_ROOT = pathlib.Path(vec_vad_tpu.__file__).parent

GATHER_FUNCS = {"take", "take_along_axis"}


def _gather_calls(tree):
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        fn = node.func
        if not (isinstance(fn, ast.Attribute) and fn.attr in GATHER_FUNCS):
            continue
        # jnp.take(...), jax.numpy.take(...), np.take is harmless (numpy
        # raises on OOB instead of filling) but hold it to the same bar so
        # a jnp->np rename never silently drops the guard.
        base = fn.value
        names = []
        while isinstance(base, ast.Attribute):
            names.append(base.attr)
            base = base.value
        if isinstance(base, ast.Name):
            names.append(base.id)
        if not names or names[-1] not in {"jnp", "np", "jax", "numpy"}:
            continue
        yield node


def test_every_gather_has_explicit_mode():
    offenders = []
    for path in sorted(PKG_ROOT.rglob("*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        for call in _gather_calls(tree):
            kwargs = {k.arg for k in call.keywords}
            if "mode" not in kwargs:
                rel = path.relative_to(PKG_ROOT.parent)
                offenders.append(f"{rel}:{call.lineno}")
    assert not offenders, (
        "gather call sites without an explicit mode= (jnp's default 'fill' "
        "mode silently fills OOB float reads with NaN — see commit b809e11 "
        "and CLAUDE.md; use mode='clip' with clamped indices):\n  "
        + "\n  ".join(offenders)
    )


def test_audit_finds_at_least_the_known_sites():
    """The gate must actually be looking at something: the package has
    dozens of gather sites (ring buffers, window gathers, RoI level
    routing) — if this count ever drops to ~0 the walker itself broke."""
    n = 0
    for path in PKG_ROOT.rglob("*.py"):
        tree = ast.parse(path.read_text(), filename=str(path))
        n += sum(1 for _ in _gather_calls(tree))
    assert n >= 20, f"gather audit only saw {n} call sites — walker broken?"
