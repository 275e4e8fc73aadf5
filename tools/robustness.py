"""Robustness matrix runner: the full oracle replay under a sweep of
adversarial configurations (session timezone, core count, shuffle
partitioning, AQE), each in a fresh interpreter so Spark/JVM state can't
leak between configurations.

Usage: python tools/robustness.py [sf_dir]
Exit code 0 iff every configuration reports FAILS: none.
"""
import os
import subprocess
import sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
HERE = os.path.dirname(os.path.abspath(__file__))

CONFIGS = [
    # (label, env overrides)
    ("baseline", {}),
    ("tz-newyork", {"TZ": "America/New_York"}),
    ("tz-kathmandu", {"TZ": "Asia/Kathmandu"}),
    ("tiny-parallelism", {"REPLAY_MASTER": "local[3]", "REPLAY_SHUFFLE": "7"}),
    ("aqe-off", {"REPLAY_AQE": "false"}),
    (
        "combined-worst",
        {
            "TZ": "Australia/Eucla",
            "REPLAY_MASTER": "local[5]",
            "REPLAY_SHUFFLE": "11",
            "REPLAY_AQE": "false",
        },
    ),
    # reverse order defeats masking by queries that pin session state
    # (e.g. the windowed-events queries set session tz to UTC; in
    # forward alphabetical order every later query inherits it). This
    # config caught the DST-interval and literal-boundary bugs.
    ("tz-newyork-reverse", {"TZ": "America/New_York", "REPLAY_REVERSE": "1"}),
]

failed = []
for label, overrides in CONFIGS:
    env = dict(os.environ, **overrides)
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "replay.py"), SF],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    tail = [
        line
        for line in out.stdout.splitlines()
        if line.startswith(("FAILS:", "total queries:"))
    ]
    ok = any(line == "FAILS: none" for line in tail)
    print(f"{label:<18} {'OK' if ok else 'FAIL'}  {' | '.join(tail)}")
    if not ok:
        failed.append(label)

if failed:
    print("FAILED configurations:", failed)
    sys.exit(1)
print("all configurations green")
