"""Golden-output examples: every examples/*.py runs and its stdout must
equal examples/output/<name>.txt byte-for-byte — the reference's example
harness pattern (/root/reference/tests/test_examples.py:9-28)."""

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(glob.glob(os.path.join(REPO, "examples", "*.py")))


@pytest.mark.parametrize("script", EXAMPLES,
                         ids=[os.path.basename(p)[:-3] for p in EXAMPLES])
def test_example_golden(script):
    name = os.path.basename(script)[:-3]
    golden = os.path.join(REPO, "examples", "output", f"{name}.txt")
    assert os.path.exists(golden), f"missing golden output for {name}"
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run([sys.executable, script], capture_output=True,
                         text=True, env=env, timeout=120)
    assert out.returncode == 0, out.stderr
    with open(golden) as f:
        assert out.stdout == f.read(), f"stdout drift in {name}"
