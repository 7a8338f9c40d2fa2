"""Environment-rotation gate: the time/locale-sensitive oracles must stay
hash-identical under a half-hour-offset timezone and a non-C locale.

The round-4 ev_* episode proved environment-sensitive divergence escapes
a default-environment gate; this pins the sensitive subset (event-time
windows/sessions, timestamp passthrough sort, pagination windows, hijri
calendar math, WARC date formatting) in a SUBPROCESS so the rotated TZ
reaches the JVM at launch, the only moment it reads TZ. The full-registry
rotated run is a tools/check_oracles.py --rotate-env invocation (recorded
in BENCH/BASELINE.md per round)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SENSITIVE = "ev_,r13_,r14_,f03_,warc_ingest"


def test_sensitive_oracles_survive_env_rotation():
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "check_oracles.py"),
         "/root/testdata/sf0.01", SENSITIVE, "--rotate-env"],
        capture_output=True, text=True, timeout=900, cwd=str(REPO))
    tail = "\n".join(out.stdout.splitlines()[-14:])
    assert out.returncode == 0, f"rotated-env gate failed:\n{tail}\n{out.stderr[-2000:]}"
    assert "ALL OK" in out.stdout, tail
    assert "rotated env: TZ=Asia/Kolkata" in out.stdout, tail
    # every sensitive family must actually have run (prefix list intact)
    for q in ("ev_windowed_agg", "ev_sessionize", "r13_sort",
              "r14_pagination", "f03_hijri", "warc_ingest"):
        assert f"ok   {q}" in out.stdout, f"{q} missing from rotated run:\n{tail}"
