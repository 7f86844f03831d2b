"""End-to-end kill/resume test: crash a partitioned-sink run mid-write
in a REAL subprocess (its own ray session), resume in a second process,
and byte-compare against an uninterrupted run — including the per-url
`text` byte-identity invariant (BASELINE.json)."""

import os
import subprocess
import sys

import pandas as pd
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = os.path.join(REPO, "tools", "resume_demo.py")


def run_demo(out_dir, crash_after=None):
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    if crash_after:
        env["GRAFT_CRASH_AFTER"] = str(crash_after)
    else:
        env.pop("GRAFT_CRASH_AFTER", None)
    return subprocess.run([sys.executable, DEMO, out_dir], env=env,
                          capture_output=True, text=True, timeout=300)


def read_all(out_dir) -> pd.DataFrame:
    parts = sorted(d for d in os.listdir(out_dir) if d.startswith("part="))
    dfs = [pq.read_table(os.path.join(out_dir, d, "data.parquet")).to_pandas()
           for d in parts]
    return pd.concat(dfs).sort_values("page_id").reset_index(drop=True)


def test_kill_and_resume_byte_identical(tmp_path):
    clean_dir = str(tmp_path / "clean")
    crash_dir = str(tmp_path / "crashy")

    r = run_demo(clean_dir)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "WROTE 8 partitions" in r.stdout

    r = run_demo(crash_dir, crash_after=3)
    assert r.returncode == 17, r.stdout + r.stderr
    assert "CRASHED" in r.stdout
    from pythongis_ray import checkpoint

    done_after_crash = checkpoint.completed_partitions(crash_dir)
    assert 0 < len(done_after_crash) < 8  # genuinely partial

    r = run_demo(crash_dir)  # resume
    assert r.returncode == 0, r.stdout + r.stderr
    n_resumed = int(r.stdout.split("WROTE ")[1].split(" partitions")[0])
    assert n_resumed == 8 - len(done_after_crash)  # only missing partitions

    a = read_all(clean_dir)
    b = read_all(crash_dir)
    pd.testing.assert_frame_equal(a, b)

    # per-row invariant: text byte-identical per url vs the source docs
    src = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    m = dict(zip(src.doc_id, src.text))
    assert all(m[pid] == txt for pid, txt in zip(b.page_id, b.text))
