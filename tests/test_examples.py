"""Every example script must run end-to-end (smoke): they share the
test session via getOrCreate and tiny synthetic inputs."""

import pathlib
import runpy
import sys

import pytest

EXAMPLES = sorted(
    p
    for p in (pathlib.Path(__file__).parent.parent / "examples").glob("*.py")
    if p.name != "_data.py"
)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(spark, path, capsys):
    sys.path.insert(0, str(path.parent))
    try:
        runpy.run_path(str(path), run_name="example")
    finally:
        sys.path.remove(str(path.parent))
    out = capsys.readouterr().out
    assert out.strip(), f"{path.name} printed nothing"
