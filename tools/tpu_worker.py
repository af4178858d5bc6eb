"""Persistent TPU experiment worker.

Watches /tmp/tpu_jobs/ for NNN.py files, executes each in one shared global
namespace (so jitted functions and device arrays stay warm across jobs), and
writes stdout + errors to NNN.out with a NNN.done marker.  Avoids paying the
remote-compile and process-startup cost for every micro-experiment.
"""
import io
import contextlib
import glob
import os
import time
import traceback

JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)

namespace: dict = {}
print("tpu_worker ready", flush=True)
while True:
    jobs = sorted(glob.glob(os.path.join(JOBS, "*.py")))
    for job in jobs:
        done = job[:-3] + ".done"
        out = job[:-3] + ".out"
        if os.path.exists(done):
            continue
        buf = io.StringIO()
        try:
            with open(job) as f:
                code = f.read()
            with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
                exec(compile(code, job, "exec"), namespace)
        except Exception:
            buf.write(traceback.format_exc())
        with open(out, "w") as f:
            f.write(buf.getvalue())
        with open(done, "w") as f:
            f.write("ok")
        print(f"done {job}", flush=True)
    time.sleep(0.5)
