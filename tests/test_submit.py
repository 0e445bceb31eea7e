"""The north-rule deployment shape: `spark-submit --py-files plume_spark.zip`.

Runs the real spark-submit binary from a neutral cwd with the package shipped
only as a zip — proving the engine deploys the way a 1000-executor cluster
job would (reference analog: Plume ships one fat jar and runs under a plain
JVM entrypoint), not just as an importable checkout.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit binary not available"
)
def test_spark_submit_py_files_build(tmp_path):
    zip_path = str(tmp_path / "plume_spark.zip")
    with zipfile.ZipFile(zip_path, "w") as z:
        pkg = os.path.join(REPO, "plume_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            os.path.join(REPO, "scripts", "submit_build.py"),
            "--generate",
            "24",
            "--store",
            str(tmp_path / "kg"),
        ],
        cwd=str(tmp_path),  # neutral cwd: the repo checkout is not importable
        capture_output=True,
        text=True,
        timeout=240,
        env={**os.environ, "PLUME_DRIVER_MEM": "2g"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    status = json.loads(out.stdout.strip().splitlines()[-1])
    # the package must have resolved from the --py-files zip, not a checkout
    assert status["package_from"].startswith(zip_path), status
    assert status["master"] == "local[4]"
    assert status["entities"] > 0 and status["triples"] > 0
    assert status["kind_violations"] == 0
