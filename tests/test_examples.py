"""Examples as acceptance tests: each example's --smoke mode asserts
the committed golden outputs in examples/expected_outputs.md (the role
the reference notebooks' embedded cell outputs play, SURVEY §4.2)."""

import os
import subprocess
import sys

import pytest

_EX = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")

_ALL = sorted(f for f in os.listdir(_EX) if f.endswith(".py"))


@pytest.mark.examples
@pytest.mark.parametrize("name", _ALL)
def test_example_smoke(name):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(_EX, name), "--smoke"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(_EX))
    assert r.returncode == 0, f"{name} failed:\n{r.stdout}\n{r.stderr}"
    assert "SMOKE PASSED" in r.stdout, f"{name}:\n{r.stdout[-2000:]}"
