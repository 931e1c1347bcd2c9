"""Smoke tests for the CLI driver programs (the reference's L5 layer)."""

import os
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _run(args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable] + args, cwd=ROOT, env=env,
        capture_output=True, text=True, timeout=600,
    )


def test_geometric_driver_cli():
    r = _run(["programs/geometric_multigrid.py", "--dim", "2",
              "--max-degree", "1", "--cycles", "1", "--f32",
              "--rtol", "1e-4"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Solver converged" in r.stdout
    assert "solution norm" in r.stdout


def test_polynomial_driver_cli():
    r = _run(["programs/polynomial_multigrid.py", "--dim", "2", "--degree",
              "3", "--levels", "3", "--cycles", "1", "--f32",
              "--rtol", "1e-4"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Solver converged" in r.stdout


def test_unstructured_driver_cli(tmp_path):
    vtu = os.path.join(tmp_path, "u.vtu")
    r = _run(["programs/unstructured_multigrid.py", "--dim", "2",
              "--degree", "2", "--refinements", "1", "--rtol", "1e-6",
              "--vtu", vtu])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Solver converged" in r.stdout
    assert os.path.exists(vtu)
