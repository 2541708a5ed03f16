"""True kill-and-resume e2e: SIGKILL the CLI driver mid-run, rerun, verify
committed shards are skipped and output is complete and correct."""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.parametrize("max_in_flight", [1, 3])
def test_sigkill_mid_job_then_resume(tmp_path, max_in_flight):
    # build a small pages corpus (own Ray session in a subprocess so the
    # pytest session's Ray is untouched)
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    gen = subprocess.run(
        [
            sys.executable,
            "-c",
            "import ray; ray.init(address='local', num_cpus=4, include_dashboard=False, logging_level='ERROR');"
            "from ray.data import DataContext; DataContext.get_current().enable_progress_bars=False;"
            "from edge_deid_studio_ray.sources.pages import ensure_pages_parquet;"
            f"ensure_pages_parquet({pages_dir!r}, 1200); ray.shutdown()",
        ],
        env={**os.environ, "PYTHONPATH": REPO},
        capture_output=True,
        text=True,
    )
    assert gen.returncode == 0, gen.stderr[-2000:]

    cli = [
        sys.executable,
        "-m",
        "edge_deid_studio_ray.cli",
        "-i",
        pages_dir,
        "-o",
        out_dir,
        "--num-cpus",
        "4",
        "--shards",
        "4",
        "--max-in-flight",
        str(max_in_flight),
    ]
    env = {**os.environ, "PYTHONPATH": REPO}

    # first run: SIGKILL once at least one shard has committed.  A manifest
    # counts as committed ONLY after the atomic tmp→rename: a lingering
    # ``*.json.tmp`` is an interrupted in-progress write (exactly what the
    # SIGKILL is meant to produce) and resume is REQUIRED to redo it, so it
    # must never be counted here.
    manifests = os.path.join(out_dir, "_manifests")

    def committed() -> set[str]:
        if not os.path.isdir(manifests):
            return set()
        return {f for f in os.listdir(manifests) if not f.endswith(".tmp")}

    proc = subprocess.Popen(cli, env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    deadline = time.time() + 120
    killed = False
    while time.time() < deadline:
        done = len(committed())
        if 1 <= done < 4:
            proc.send_signal(signal.SIGKILL)
            killed = True
            break
        if proc.poll() is not None:
            break  # finished before we could kill — fall through to resume
        time.sleep(0.2)
    proc.wait(timeout=60)

    committed_before = committed()
    if killed and len(committed_before) == 4:
        # race: between the manifest-count check and SIGKILL delivery the
        # remaining shards all committed (seen under heavy CPU contention);
        # treat like the finished-before-kill path — resume must still skip
        killed = False
    if killed and not committed_before:
        # race the other way: the committed shard's rename landed between our
        # count and the kill?  Impossible (rename is what we counted) — but a
        # crash-during-rename could in principle leave zero commits; resume
        # must then simply redo everything, which the asserts below cover.
        pass
    elif killed:
        assert 1 <= len(committed_before) < 4

    # resume run must complete, skipping whatever committed
    out = subprocess.run(cli, env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["docs"] == 1200
    assert report["shards_skipped"] >= len(committed_before)
    if killed and committed_before:
        assert report["shards_skipped"] >= 1

    # output completeness: every url exactly once
    import pyarrow.dataset as pads

    table = pads.dataset(out_dir, format="parquet", partitioning="hive").to_table(
        columns=["url"]
    )
    urls = table["url"].to_pylist()
    assert len(urls) == 1200
    assert len(set(urls)) == 1200
