"""Docs/artifact drift gate (VERDICT r04 item 2, fourth-round offense).

README.md and PARITY.md carry generated perf blocks between PERF:BEGIN/END
markers; this test regenerates them from the committed BENCH_r*.json /
TRAIN_BENCH.json artifacts and fails if the committed prose disagrees —
numbers in the docs can no longer drift from the artifacts while the suite
is green.  (Reference analog: its perf numbers lived only in README prose,
which is why BASELINE.md had to be reconstructed — this gate prevents
reproducing that failure mode.)
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_and_parity_perf_blocks_match_artifacts():
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "update_docs.py"),
         "--check"], capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr


def test_no_stale_train_ms_in_readme():
    """The README must not quote a ms/step figure that disagrees with the
    committed TRAIN_BENCH.json (the exact r04 failure: prose said 39.5,
    artifact said 33.02)."""
    import json
    import re
    with open(os.path.join(ROOT, "TRAIN_BENCH.json")) as f:
        ms = json.load(f)["train_step_ms"]
    with open(os.path.join(ROOT, "README.md")) as f:
        text = f.read()
    for m in re.finditer(r"(\d+(?:\.\d+)?)\s*ms/step", text):
        assert abs(float(m.group(1)) - ms) < 1e-6, (
            f"README quotes {m.group(1)} ms/step but TRAIN_BENCH.json "
            f"says {ms}")
