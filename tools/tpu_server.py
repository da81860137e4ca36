"""Persistent TPU job server: holds ONE TPU claim and executes queued
python snippets in a shared namespace (so compiled state, workloads and
imports persist across jobs — the claim costs ~8 min per process, see
.claude/skills/verify/SKILL.md).

Queue: drop ``NNN_name.py`` files into /tmp/tpujobs; they run in
lexicographic order, are renamed ``*.py.done`` when finished, and all
output goes to this process's stdout (redirect to a log).  Drop a file
named ``STOP`` to shut the server down cleanly.
"""
import os
import sys
import time
import traceback

JOBS = "/tmp/tpujobs"
os.makedirs(JOBS, exist_ok=True)
sys.path.insert(0, "/root/repo")

ns: dict = {}
print("server starting; claiming TPU...", flush=True)
t0 = time.time()
import jax  # noqa: E402

print(f"devices after {time.time() - t0:.0f}s: {jax.devices()}", flush=True)

while True:
    if os.path.exists(os.path.join(JOBS, "STOP")):
        print("STOP seen; exiting", flush=True)
        break
    jobs = sorted(f for f in os.listdir(JOBS) if f.endswith(".py"))
    for j in jobs:
        p = os.path.join(JOBS, j)
        try:
            src = open(p).read()
        except FileNotFoundError:
            continue
        os.rename(p, p + ".running")
        print(f"=== RUN {j}", flush=True)
        tj = time.time()
        try:
            exec(compile(src, j, "exec"), ns)
        except SystemExit:
            raise
        except Exception:
            traceback.print_exc()
        print(f"=== DONE {j} ({time.time() - tj:.1f}s)", flush=True)
        os.rename(p + ".running", p + ".done")
        sys.stdout.flush()
    time.sleep(2)
