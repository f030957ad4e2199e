"""Pins for tools/rotate_priority.py — the per-round rotation is the
single highest-leverage round-start action (an unrotated registry
wastes a whole grading window re-grading greens), so the tool that
mechanizes it gets the same test treatment as an operator.

Everything runs the tool in a subprocess: dry runs must never mutate
registry.py, and the in-process registry must stay frozen at 391.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "rotate_priority.py")
LATEST = os.path.join(REPO, "CORRECTNESS_r07.json")


def _run(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, TOOL, *args],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )


def test_dry_run_reproduces_the_committed_rotation():
    """Against the same CORRECTNESS file the r8 hand-rotation used, the
    tool must produce the identical window head — the rule set and the
    committed list agree."""
    reg_path = os.path.join(
        REPO, "python_kinesis_streaming_spark", "registry.py"
    )
    before = open(reg_path, "rb").read()
    out = _run(LATEST)
    assert out.returncode == 0, out.stderr
    assert "dry run" in out.stdout
    assert (
        "next window (first 50): agg_geometric_mean .. "
        "events_score_decile_lift" in out.stdout
    )
    assert "regrade-first" in out.stdout
    # dry run never touches the file (compare bytes, not git state —
    # registry.py may legitimately be dirty mid-flip)
    assert open(reg_path, "rb").read() == before


def test_with_promotions_appends_behind_never_graded_block():
    out = _run(LATEST, "--with-promotions")
    assert out.returncode == 0, out.stderr
    assert "promotion block: 51" in out.stdout
    # promotions must NOT dilute the next window
    assert (
        "next window (first 50): agg_geometric_mean .. "
        "events_score_decile_lift" in out.stdout
    )


def test_write_with_promotions_is_a_complete_reversible_flip(tmp_path):
    """--write --with-promotions on a COPY of the repo tree must insert
    the promotions_flip hook AND the 51 names; the registry then loads
    442 ops with the grading window unchanged."""
    import shutil

    pkg = "python_kinesis_streaming_spark"
    work = tmp_path / "repo"
    (work / "tools").mkdir(parents=True)
    shutil.copytree(os.path.join(REPO, pkg), work / pkg)
    shutil.copy(TOOL, work / "tools" / "rotate_priority.py")
    for f in os.listdir(REPO):
        if f.startswith("CORRECTNESS_r") and f.endswith(".json"):
            shutil.copy(os.path.join(REPO, f), work / f)

    out = subprocess.run(
        [
            sys.executable,
            str(work / "tools" / "rotate_priority.py"),
            str(work / "CORRECTNESS_r07.json"),
            "--write",
            "--with-promotions",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(work),
    )
    assert out.returncode == 0, out.stderr
    assert "inserted" in out.stdout and "promotions_flip" in out.stdout

    check = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, %r)\n"
            "from python_kinesis_streaming_spark import registry\n"
            "qs = list(registry.all_queries())\n"
            "assert len(qs) == 442, len(qs)\n"
            "assert qs[0] == 'agg_geometric_mean', qs[0]\n"
            "assert qs[101] == 'media_png_roundtrip_stats', qs[101]\n"
            "print('POST-FLIP-OK')\n" % str(work),
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert check.returncode == 0, check.stderr
    assert "POST-FLIP-OK" in check.stdout
