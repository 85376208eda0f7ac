"""Persistent TPU job worker: keeps the (slow to initialize) TPU backend
alive and executes python job files dropped into /tmp/tpuq in name order.

Job protocol: write `NNN_name.py` into /tmp/tpuq; the worker execs it (fresh
globals, __name__ = "__tpu_job__"), renames it to .done (or .failed) and
appends all output to its own stdout. Development harness only — not part of
the framework.
"""

import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

QUEUE = "/tmp/tpuq"
os.makedirs(QUEUE, exist_ok=True)

t0 = time.time()
print("worker: devices", jax.devices(), f"init {time.time() - t0:.1f}s",
      flush=True)

while True:
    jobs = sorted(f for f in os.listdir(QUEUE) if f.endswith(".py"))
    if not jobs:
        time.sleep(2)
        continue
    name = jobs[0]
    path = os.path.join(QUEUE, name)
    with open(path) as fh:
        src = fh.read()
    os.rename(path, path + ".running")
    print(f"=== START {name} {time.strftime('%H:%M:%S')}", flush=True)
    t0 = time.time()
    try:
        exec(compile(src, name, "exec"), {"__name__": "__tpu_job__"})
        status = "done"
    except SystemExit:
        status = "done"
    except Exception:  # noqa: BLE001
        traceback.print_exc()
        status = "failed"
    print(f"=== END {name} [{status}] {time.time() - t0:.1f}s", flush=True)
    os.rename(path + ".running", os.path.join(QUEUE, name + f".{status}"))
