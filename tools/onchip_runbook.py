"""Unattended on-chip measurement runbook for the round-3 experiment gates.

Waits for the (currently wedged) tunneled TPU to answer a small-matmul
health probe, then runs the queued measurements in sequence, logging each
to its own file. Designed to run for hours in the background and capture a
recovery window without interaction:

  1. kv-precompute A/B + artifact parity  (tools/profile_kv_precompute.py)
  2. DMA queue-depth probe                (tools/probe_dma.py)
  3. decode-kernel A/B grid               (tools/profile_cross_stream.py)
  4. large-beam window-batch sweep        (bench.py --worker, batch 4/6/8)

Deliberately does NOT flip any defaults and does NOT run the full bench
sweep — those are judgment calls made from the logs.

Usage:  nohup python tools/onchip_runbook.py > /tmp/runbook.log 2>&1 &
Logs:   /tmp/onchip/<step>.log, progress lines to stdout.
"""

import importlib.util
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOGDIR = "/tmp/onchip"

# share bench.py's probe (same subprocess matmul, plus the persistent
# compilation-cache setup — without the cache every poll pays a fresh XLA
# compile, and a compile-service-only slump reads as a wedged chip here
# while bench's cached probe passes)
_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(REPO, "bench.py"))
_bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_bench)


def log(msg):
    print(f"[runbook {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def probe(timeout=150):
    return _bench.probe_health(timeout=timeout)


def wait_for_chip(poll_s=240, healthy_s=5.0, max_wait_h=24):
    deadline = time.time() + max_wait_h * 3600
    while time.time() < deadline:
        t = probe()
        log(f"health probe: {'timeout' if t is None else f'{t:.2f}s'}")
        if t is not None and t < healthy_s:
            return True
        time.sleep(poll_s)
    return False


def run_step(name, cmd, timeout):
    path = os.path.join(LOGDIR, f"{name}.log")
    log(f"step {name}: {' '.join(cmd)}")
    t0 = time.time()
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, cwd=REPO)
        out = p.stdout + "\n--- stderr ---\n" + p.stderr
        status = f"rc={p.returncode}"
    except subprocess.TimeoutExpired as e:
        out = ((e.stdout or "") if isinstance(e.stdout, str) else "") + \
            "\n--- TIMEOUT ---\n"
        status = f"timeout {timeout}s"
    with open(path, "w") as f:
        f.write(out)
    log(f"step {name}: {status} in {time.time() - t0:.0f}s -> {path}")


def main():
    os.makedirs(LOGDIR, exist_ok=True)
    if not wait_for_chip():
        log("chip never recovered within the wait budget")
        return 1
    log("chip healthy — running gates")

    py = sys.executable
    run_step("kv_precompute_int8",
             [py, "tools/profile_kv_precompute.py", "--batch", "24"], 1500)
    run_step("probe_dma",
             [py, "tools/probe_dma.py", "--mb", "512"], 1500)
    run_step("cross_stream_ab",
             [py, "tools/profile_cross_stream.py", "--batch", "24",
              "--steps", "96"], 5400)
    for batch in (4, 6, 8):
        run_step(f"large_beam_b{batch}",
                 [py, "bench.py", "--worker", "--size", "large-v1",
                  "--batch", str(batch), "--beam", "5",
                  "--tokens", "96", "--iters", "2"], 1200)
    # re-probe at the end so the logs say whether the window stayed clean
    t = probe()
    log(f"final health probe: {'timeout' if t is None else f'{t:.2f}s'}")
    log("runbook complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
