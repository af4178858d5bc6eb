"""Persistent TPU experiment worker.

Watches /tmp/tpu_jobs/ for NNN.py files, executes each in one shared global
namespace (so jitted functions and device arrays stay warm across jobs), and
streams stdout + errors to NNN.out with a NNN.done marker.  Avoids paying the
remote-compile and process-startup cost for every micro-experiment.

Crash-resilient: output streams to NNN.out live (nothing lost if the
process dies mid-job — the remote-TPU tunnel occasionally kills the client
silently), a NNN.started marker is written before execution, and on restart
a job with .started but no .done is marked crashed and skipped instead of
re-running forever.  Run under a restart loop:

    while true; do python tools/tpu_worker.py; sleep 2; done
"""
import contextlib
import glob
import os
import time
import traceback

JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)

namespace: dict = {}
print("tpu_worker ready", flush=True)

# mark jobs that crashed the previous worker instance
for started in glob.glob(os.path.join(JOBS, "*.started")):
    base = started[:-len(".started")]
    if not os.path.exists(base + ".done"):
        with open(base + ".out", "a") as f:
            f.write("\n[tpu_worker] previous instance died during this job\n")
        with open(base + ".done", "w") as f:
            f.write("crashed")

while True:
    jobs = sorted(glob.glob(os.path.join(JOBS, "*.py")))
    for job in jobs:
        done = job[:-3] + ".done"
        out = job[:-3] + ".out"
        started = job[:-3] + ".started"
        if os.path.exists(done):
            continue
        with open(started, "w") as f:
            f.write("ok")
        with open(job) as f:
            code = f.read()
        with open(out, "w", buffering=1) as buf:
            try:
                with contextlib.redirect_stdout(buf), \
                        contextlib.redirect_stderr(buf):
                    exec(compile(code, job, "exec"), namespace)
            except Exception:
                buf.write(traceback.format_exc())
        with open(done, "w") as f:
            f.write("ok")
        print(f"done {job}", flush=True)
    time.sleep(0.5)
