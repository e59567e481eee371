"""Help-rendering regression gate for every CLI subcommand.

argparse %-formats help strings at render time, so a bare '%' (or any
invalid format spec) in a help= raises TypeError only when --help is
actually rendered — never on the code path tests normally exercise.
Round-4 shipped exactly that bug (`serve --help` crashed on
"~9% faster"); this gate renders the top-level help plus every
subparser's so the class can't recur.
"""

import contextlib
import io
import re

import pytest

from vec_vad_tpu.cli import main


def _render_help(argv):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        with pytest.raises(SystemExit) as exc:
            main(argv)
    assert exc.value.code == 0, f"--help exited {exc.value.code} for {argv}"
    return buf.getvalue()


def test_every_subcommand_help_renders():
    top = _render_help(["--help"])
    # subcommand names from the usage metavar: "{train,test,...}"
    m = re.search(r"\{([a-z0-9,-]+)\}", top)
    assert m, f"no subcommand list in top-level help:\n{top}"
    cmds = m.group(1).split(",")
    assert len(cmds) >= 12, cmds
    for cmd in cmds:
        text = _render_help([cmd, "--help"])
        assert text.startswith("usage:"), (cmd, text[:80])
