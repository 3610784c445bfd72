"""Tunnel watcher: poll the axon TPU and run the queued on-chip jobs.

The axon tunnel dies for hours at a time (it cost round 3 both driver
artifacts). This watcher loops a cheap subprocess probe (tiny matmul
under a timeout — the documented way to test chip state; see
.claude/skills/verify/SKILL.md) and, the moment the chip answers, runs
the round's queued on-chip jobs in priority order, logging each to
artifacts/tpu_watch/<job>.log and a status line to status.jsonl.

Jobs (round 4, VERDICT r3 items 2/3/4/7):
  1. bench suite            -> bench_suite.json       (item 2)
  2. subpel kernel smoke    -> subpel_smoke.log       (cheap Mosaic gate)
  3. fast-shuffle estimate  -> fast_shuffle.json      (item 7 measurement)
  4. train-step p1 + p2     -> train_step_p{1,2}.json (item 2, remat)
  5. overfit 256 curriculum -> overfit_r4/            (item 3; hours)
  6. bf16 BD gate on 5's ckpt -> bf16_gate.json       (item 4)

Run detached:  python tools/tpu_watch.py >> artifacts/tpu_watch/watch.log 2>&1
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "artifacts", "tpu_watch")
sys.path.insert(0, REPO)

from vcm_ts_tpu.utils.tpu_probe import probe_tpu  # noqa: E402


def log(msg):
    line = {"ts": time.time(), "msg": msg}
    print(time.strftime("%H:%M:%S"), msg, flush=True)
    with open(os.path.join(OUT, "status.jsonl"), "a") as f:
        f.write(json.dumps(line) + "\n")


def probe(timeout=120):
    return probe_tpu(timeout)[0]


# bench.py writes its pid here while it runs against the real chip; the
# watcher yields the chip to any bench process it did not launch itself
# (i.e. the driver's end-of-round capture).
BENCH_SENTINEL = "/tmp/vcm_bench_active"


def _foreign_bench_pid(own_child_pid):
    """Pid of a LIVE bench.py holding the sentinel, unless it is (a
    descendant of) our own child; None otherwise. Stale files cleared."""
    try:
        with open(BENCH_SENTINEL) as f:
            pid = int(f.read().strip())
    except (OSError, ValueError):
        return None
    try:
        os.kill(pid, 0)  # liveness, no signal delivered
    except ProcessLookupError:
        try:
            os.unlink(BENCH_SENTINEL)
        except OSError:
            pass
        return None
    except PermissionError:
        pass
    # our own bench jobs write the sentinel too: walk pid's ancestry to
    # see if it descends from the child we launched
    p = pid
    for _ in range(16):
        if p == own_child_pid:
            return None
        try:
            with open(f"/proc/{p}/stat") as f:
                p = int(f.read().split(") ")[-1].split()[1])  # ppid
        except (OSError, ValueError, IndexError):
            break
        if p <= 1:
            break
    return pid


def run_job(name, cmd, timeout):
    """Run one job; return "ok" | "fail" | "outage". Logs to <name>.log.

    "outage" (always retried by main) covers rc=0 runs whose output
    contains a structured tpu-unavailable error: bench.py deliberately
    exits 0 with an {"error": "tpu-unavailable..."} JSON line when its
    own probe fails (so the driver captures a parseable artifact), and
    marking that 'ok' would silently skip the queued benchmark forever —
    the empty-artifact failure mode this watcher exists to prevent.
    """
    path = os.path.join(OUT, name + ".log")
    log(f"start {name}: {' '.join(cmd)}")
    preempted = False
    with open(path, "a") as f:
        f.write(f"\n=== {time.strftime('%F %T')} {' '.join(cmd)}\n")
        f.flush()
        start = f.tell()
        proc = subprocess.Popen(cmd, cwd=REPO, stdout=f, stderr=f)
        deadline = time.time() + timeout
        rc = None
        while rc is None:
            try:
                rc = proc.wait(timeout=5)
            except subprocess.TimeoutExpired:
                if time.time() > deadline:
                    proc.terminate()
                    try:
                        proc.wait(timeout=30)
                    except subprocess.TimeoutExpired:
                        proc.kill()
                    rc = -1
                elif _foreign_bench_pid(proc.pid) is not None:
                    # the driver's bench.py claimed the chip: yield it
                    # (SIGTERM this exact child) and requeue the job
                    log(f"preempting {name}: foreign bench.py holds "
                        f"{BENCH_SENTINEL}")
                    proc.terminate()
                    try:
                        proc.wait(timeout=60)
                    except subprocess.TimeoutExpired:
                        proc.kill()
                    rc = -1
                    preempted = True
    if preempted:
        # wait out the foreign bench before letting main retry the queue
        while _foreign_bench_pid(None) is not None:
            time.sleep(15)
        log(f"{name} preempted by bench.py; will retry")
        return "outage"
    with open(path) as f:
        f.seek(start)
        appended = f.read()
    if "tpu-unavailable" in appended:
        log(f"done {name}: rc={rc} with tpu-unavailable reported")
        return "outage"
    log(f"done {name}: rc={rc}")
    return "ok" if rc == 0 else "fail"


# The queue is data-driven: if tools/tpu_watch_jobs.json exists it is
# re-read EVERY loop (so jobs can be appended/edited while the watcher
# runs, without a restart); otherwise the built-in list below is used.
# JSON schema: [[name, [argv...], timeout_s, marker_file], ...] with
# "PY" in argv substituted by sys.executable.
JOBS_FILE = os.path.join(REPO, "tools", "tpu_watch_jobs.json")


def load_jobs():
    if os.path.exists(JOBS_FILE):
        with open(JOBS_FILE) as f:
            raw = json.load(f)
        return [(n, [sys.executable if a == "PY" else a for a in cmd],
                 t, m) for n, cmd, t, m in raw]
    return JOBS


JOBS = [
    # (name, cmd, timeout_s, done_marker_file)
    ("bench_suite",
     # 5 distinct 1080p programs (bf16 estimation + pipelined enc/dec +
     # 2-stream write + f32 estimation); cold tunnel compiles run 5-30 min
     # each, so give the suite headroom (the persistent cache makes warmed
     # re-runs fast)
     [sys.executable, "bench.py"], 7200, "bench_suite.done"),
    ("subpel_smoke",
     # cheap Mosaic-lowering + exactness gate at real shapes; catches
     # block-rule violations in ~2 min instead of a failed 1080p bench
     [sys.executable, "tools/subpel_smoke.py"], 1800, "subpel_smoke.done"),
    ("fast_shuffle",
     [sys.executable, "bench.py", "--fast-shuffle", "--estimate-only"],
     2400, "fast_shuffle.done"),
    ("train_step_p1",
     [sys.executable, "bench.py", "--train-step", "--p-frames", "1"],
     2400, "train_step_p1.done"),
    ("train_step_p2",
     [sys.executable, "bench.py", "--train-step", "--p-frames", "2"],
     3600, "train_step_p2.done"),
    ("train_step_p2_mp",
     [sys.executable, "bench.py", "--train-step", "--p-frames", "2",
      "--mp"], 3600, "train_step_p2_mp.done"),
    ("overfit256",
     [sys.executable, "tools/overfit_run.py", "--iters", "150", "--size",
      "256", "--bf16-check", "--out", "artifacts/overfit_r4"],
     6 * 3600, "overfit256.done"),
    ("bf16_gate",
     [sys.executable, "tools/bf16_bd_gate.py", "--ckpt",
      "artifacts/overfit_r4/overfit_final.ckpt"],
     3600, "bf16_gate.done"),
]


def main():
    os.makedirs(OUT, exist_ok=True)
    log("watcher up")
    while True:
        pending = [j for j in load_jobs()
                   if not os.path.exists(os.path.join(OUT, j[3]))]
        if not pending:
            log("all jobs done; exiting")
            return
        if not probe():
            log(f"tunnel DOWN ({len(pending)} jobs pending)")
            time.sleep(180)
            continue
        log("tunnel UP")
        name, cmd, timeout, marker = pending[0]
        # jobs that consume the overfit checkpoint can't run if the
        # overfit job failed to produce one
        ckpt_args = [a for a in cmd if a.endswith("overfit_final.ckpt")]
        if ckpt_args and not os.path.exists(
                os.path.join(REPO, ckpt_args[0])):
            log(f"{name}: checkpoint missing (overfit failed?); skipping")
            open(os.path.join(OUT, marker), "w").write("skipped\n")
            continue
        status = run_job(name, cmd, timeout)
        if status == "ok":
            open(os.path.join(OUT, marker), "w").write("ok\n")
        elif status == "outage":
            log(f"{name} hit a tunnel outage; will retry")
        else:
            # re-probe: if the tunnel died mid-job, retry later; if the
            # chip is fine the job itself is broken — mark failed so the
            # queue advances instead of looping forever.
            if probe():
                log(f"{name} failed with tunnel UP; marking failed")
                open(os.path.join(OUT, marker), "w").write("failed\n")
            else:
                log(f"{name} died to tunnel outage; will retry")
        time.sleep(5)


if __name__ == "__main__":
    main()
