"""CLI smoke: gen → extract → verify through `python -m unipdf_spark`."""

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_end_to_end():
    d = tempfile.mkdtemp()
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    try:
        def run(*args):
            p = subprocess.run(
                [sys.executable, "-m", "unipdf_spark", *args],
                capture_output=True, text=True, cwd=REPO, env=env, timeout=600,
            )
            lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
            assert lines, p.stderr[-2000:]
            return json.loads(lines[-1]), p.returncode

        out, _ = run("gen", "--out", f"{d}/docs", "--n", "20")
        assert out["written"] == 20
        out, _ = run("extract", "--in", f"{d}/docs", "--out", f"{d}/spans")
        assert out["extracted"] == 20
        out, rc = run("verify", "--docs", f"{d}/docs", "--spans", f"{d}/spans")
        assert out == {"docs": 20, "match": 20, "pass_rate": 1.0}
        assert rc == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)
