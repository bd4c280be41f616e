"""Execute the analyses/ notebooks (figure_2, figure_4) cell by cell.

The reference ships its analyses as notebooks (analyses/figure_2.ipynb,
figure_4.ipynb); ours must stay runnable without the Dryad pickles (they
fall back to synthetic dicts in the exact pickle schemas). Cells are
exec'd in order from a scratch cwd, so the data-present branch is skipped
and every rendered panel must be written.
"""

import glob
import os
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

nbformat = pytest.importorskip("nbformat")


@pytest.mark.parametrize("name,outdir,n_panels", [
    ("figure_2.ipynb", "figure_2_out", 3),
    ("figure_4.ipynb", "figure_4_out", 3),
])
def test_notebook_runs(tmp_path, monkeypatch, name, outdir, n_panels):
    nb = nbformat.read(os.path.join(REPO, "analyses", name), as_version=4)
    monkeypatch.chdir(tmp_path)
    monkeypatch.syspath_prepend(REPO)
    ns = {}
    for cell in nb.cells:
        if cell.cell_type == "code":
            exec(compile(cell.source, name, "exec"), ns)
    panels = glob.glob(os.path.join(str(tmp_path), outdir, "*.png"))
    assert len(panels) == n_panels, panels
    for p in panels:
        assert os.path.getsize(p) > 5000
