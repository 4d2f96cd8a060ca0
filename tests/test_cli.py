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


def test_cli_corpus_ingest(tmp_path):
    """`python -m unipdf_spark corpus --in DIR` — the driver-facing entry
    for the real-corpus harness: per-doc outcome parquet + report file +
    one JSON summary line."""
    from unipdf_spark.fixtures.gen import make_doc, make_html_doc

    (tmp_path / "a.pdf").write_bytes(make_doc("cli_a", "plain", seed=3)[1])
    (tmp_path / "p.html").write_text(make_html_doc(
        "cli_h", "A long enough article body for the cli corpus smoke "
        "test to extract meaningful content from."))
    (tmp_path / "junk.dat").write_bytes(b"\x01\x02nonsense")
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    p = subprocess.run(
        [sys.executable, "-m", "unipdf_spark", "corpus",
         "--in", str(tmp_path), "--report", str(tmp_path / "report.md"),
         "--out", str(tmp_path / "rows")],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=600,
    )
    lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
    assert lines, p.stderr[-2000:]
    out = json.loads(lines[-1])
    assert out == {"files": 3, "ok": 2, "errors": 1}
    report = (tmp_path / "report.md").read_text()
    assert "3 files, 2 ok" in report and "Error taxonomy" in report
    assert (tmp_path / "rows").is_dir()
