"""Syntax hygiene for every standalone script in the repo.

Round-3 post-mortem: three on-chip backlog slots were burned on
ModuleNotFoundError / SyntaxError in tools/*.py that a 1-second
``py_compile`` sweep would have caught before they ever reached the chip.
This test IS that sweep: every tools/, cli/ and repo-root script must at
least compile; the spawn-style entry points must also survive a
``--help``-free import-syntax check (compile covers the from __future__
placement class of failure exactly).
"""
import pathlib
import py_compile

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

SCRIPTS = sorted(
    list((REPO / "tools").glob("*.py"))
    + list((REPO / "splatloc_tpu" / "cli").glob("*.py"))
    + [REPO / "bench.py", REPO / "bench_pose.py", REPO / "__graft_entry__.py"]
)


@pytest.mark.parametrize("path", SCRIPTS, ids=lambda p: str(p.relative_to(REPO)))
def test_script_compiles(path, tmp_path):
    assert path.exists(), path
    py_compile.compile(str(path), cfile=str(tmp_path / "out.pyc"),
                       doraise=True)
