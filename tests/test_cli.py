"""CLI surface: synth → crawl → artifacts in subprocesses (their own Ray
sessions; kept tiny)."""

import json
import subprocess
import sys


def _run(*args):
    return subprocess.run(
        [sys.executable, "-m", "frontera_ray.cli", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )


def test_cli_end_to_end(tmp_path):
    fx = str(tmp_path / "fx")
    ck = str(tmp_path / "ck")
    r = _run("synth", "--out", fx, "--spec", "smoke")
    assert r.returncode == 0, r.stderr
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["parts"] == 4

    r = _run(
        "crawl",
        "--pages", f"{fx}/pages",
        "--seeds", f"{fx}/seeds.parquet",
        "--checkpoint", ck,
        "--policy", "bfs",
        "--epochs", "3",
        "--num-cpus", "4",
    )
    assert r.returncode == 0, r.stderr
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["epochs"] == 3 and summary["fetched"] > 0

    r = _run("artifacts", "--checkpoint", ck)
    assert r.returncode == 0, r.stderr
    art = json.loads(r.stdout.strip().splitlines()[-1])
    assert art["latest_epoch"] == 2
    assert art["totals"]["fetched"] == summary["fetched"]


def test_cli_bad_pages_dir(tmp_path):
    r = _run(
        "crawl", "--pages", str(tmp_path / "nope"), "--seeds", "x",
        "--checkpoint", str(tmp_path / "ck"),
    )
    assert r.returncode != 0
