"""The spark-submit --py-files artifact: deterministic and executor-loadable.

The north rule's batch entry point is ``spark-submit --py-files`` on a
multi-executor cluster; these tests pin the two properties the artifact
needs there: byte-determinism (so the zip can be content-addressed and
cached in cluster storage) and zipimport-ability (executors extend
``sys.path`` with the zip — the package must import from inside it, which
e.g. ``__file__``-relative data loading would break).
"""

import os
import subprocess
import sys

from scripts.make_pyfiles import build_zip


def test_pyfiles_zip_deterministic(tmp_path):
    z1, z2 = str(tmp_path / "a.zip"), str(tmp_path / "b.zip")
    m1 = build_zip(z1)
    m2 = build_zip(z2)
    assert m1 == m2
    assert open(z1, "rb").read() == open(z2, "rb").read()
    assert any(m.endswith("blurrily_spark/__init__.py") for m in m1)
    assert any(m.endswith("plans/pipeline.py") for m in m1)
    assert not any("__pycache__" in m or m.endswith(".pyc") for m in m1)


def test_pyfiles_zip_imports_like_an_executor(tmp_path):
    zpath = str(tmp_path / "blurrily_spark.zip")
    build_zip(zpath)
    # Fresh interpreter, cwd away from the repo, repo stripped from the
    # path: the ONLY way blurrily_spark can resolve is through the zip --
    # exactly an executor's view after --py-files.
    code = (
        "import sys, blurrily_spark, blurrily_spark.plans.pipeline as p; "
        "print(blurrily_spark.__file__); print(p.__name__)"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = zpath
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    loc, name = proc.stdout.strip().splitlines()
    assert loc.startswith(zpath + os.sep), loc
    assert name == "blurrily_spark.plans.pipeline"
