"""Round-4 chip-gated chain watcher.

The tunneled chip drops for minutes-to-hours (3h+ observed); this
watcher turns the serialized on-chip queue into an unattended chain so
zero claim time is lost between relay return and operator attention:

  1. babysit the in-flight biencoder xl2 retrain (/tmp/bi_xl2.log):
     * process died -> relaunch (benchmarks/retrain_biencoder_xl.py
       resumes from its snapshot marker if one exists);
     * process frozen (no CPU progress) but a short-lived subprocess
       probe says the relay is healthy -> the training session's claim
       is dead; kill BY PID and relaunch;
     * frozen and relay still down -> keep waiting.
  2. once the retrain prints its holdout line (or relaunches are
     exhausted): run the shared-holdout gate over bundled/xl/xl2;
  3. run the round-4 kernel component sweep;
  4. run a bench.py validation pass (its own watchdog bounds it).

Each stage is a separate process with a hard timeout, so one TPU
process exists at a time and a relay death mid-chain cannot wedge the
chain. Logs: /tmp/chain_r4.log; stage outputs under /tmp/.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RETRAIN_LOG = "/tmp/bi_xl2.log"
RETRAIN_PID_FILE = "/tmp/bi_xl2.pid"
DONE_MARK = "ICT-holdout recall"
_LOG = open("/tmp/chain_r4.log", "a", buffering=1)


def log(m: str) -> None:
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, file=_LOG)
    print(line, flush=True)


def pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


def cpu_jiffies(pid: int):
    try:
        with open(f"/proc/{pid}/stat") as fh:
            parts = fh.read().split()
        return int(parts[13]) + int(parts[14])
    except Exception:
        return None


def retrain_done() -> bool:
    try:
        with open(RETRAIN_LOG) as fh:
            return DONE_MARK in fh.read()
    except OSError:
        return False


def probe_healthy() -> bool:
    """Claim-probe in a SUBPROCESS so its claim attempt dies with it."""
    # os._exit after printing: a timed-out probe's claim thread is
    # non-daemon and blocked in backend init, so a normal exit would
    # hang the child until the outer kill.
    code = ("from optimized_rag_tpu.utils.health import "
            "check_device_health; import json, os, sys; "
            "print(json.dumps(check_device_health(75.0))); "
            "sys.stdout.flush(); os._exit(0)")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=150,
                           cwd=REPO)
        out = r.stdout or ""
    except subprocess.TimeoutExpired as exc:
        out = exc.stdout or ""
        if isinstance(out, bytes):
            out = out.decode("utf-8", "replace")
    except Exception as exc:
        log(f"probe error: {exc!r}")
        return False
    for ln in reversed(out.strip().splitlines() or [""]):
        if ln.startswith("{"):
            try:
                return bool(json.loads(ln).get("healthy"))
            except ValueError:
                pass
    return False


def relaunch_retrain() -> int:
    with open(RETRAIN_LOG, "a", buffering=1) as out:
        p = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "benchmarks",
                                          "retrain_biencoder_xl.py")],
            stdout=out, stderr=subprocess.STDOUT, cwd=REPO,
            start_new_session=True)
    with open(RETRAIN_PID_FILE, "w") as fh:
        fh.write(str(p.pid))
    log(f"relaunched retrain as pid {p.pid}")
    return p.pid


def stage(name: str, cmd, out_path: str, timeout_s: int,
          env_extra=None) -> int:
    log(f"stage {name}: {' '.join(cmd)} -> {out_path}")
    env = dict(os.environ, **(env_extra or {}))
    try:
        with open(out_path, "w", buffering=1) as out, \
                open(out_path + ".err", "w", buffering=1) as err:
            r = subprocess.run(cmd, stdout=out, stderr=err,
                               cwd=REPO, env=env, timeout=timeout_s)
        log(f"stage {name}: rc={r.returncode}")
        return r.returncode
    except subprocess.TimeoutExpired:
        log(f"stage {name}: TIMEOUT after {timeout_s}s")
        return -1


def _log_steps() -> int:
    """Count training-step lines in the retrain log (progress marker)."""
    try:
        with open(RETRAIN_LOG) as fh:
            return sum(1 for ln in fh if "biencoder step" in ln)
    except OSError:
        return 0


def babysit_retrain(max_progress_deaths: int = 3,
                    frozen_cap_s: float = 6 * 3600,
                    wall_cap_s: float = 9 * 3600) -> None:
    """Fast deaths (relay refusing: backend init raises in seconds, no
    step lines added) do NOT consume the relaunch budget — they back
    off 600s and retry, bounded only by ``wall_cap_s``. Deaths AFTER
    training progress count against ``max_progress_deaths`` (something
    is wrong beyond relay availability)."""
    progress_deaths = 0
    frozen_since = None
    t_start = time.monotonic()
    steps_at_launch = _log_steps()
    if not os.path.exists(RETRAIN_PID_FILE) and not retrain_done():
        # Fresh boot: nothing in flight yet — launch immediately rather
        # than treating the missing pid file as a relay-refused death.
        relaunch_retrain()
        time.sleep(120)
    while not retrain_done():
        if time.monotonic() - t_start > wall_cap_s:
            log("babysit wall cap reached; moving on")
            return
        try:
            pid = int(open(RETRAIN_PID_FILE).read().strip())
        except Exception:
            pid = -1
        if not pid_alive(pid):
            if retrain_done():
                break
            made_progress = _log_steps() > steps_at_launch
            if made_progress:
                progress_deaths += 1
                if progress_deaths > max_progress_deaths:
                    log("retrain keeps dying after making progress; "
                        "moving on with existing checkpoints")
                    return
            else:
                log("fast death (relay refusing); 600s backoff")
                time.sleep(600)
            steps_at_launch = _log_steps()
            relaunch_retrain()
            frozen_since = None
            time.sleep(120)
            continue
        c0 = cpu_jiffies(pid)
        time.sleep(180)
        c1 = cpu_jiffies(pid)
        if c1 is None or c0 is None:
            continue
        if c1 - c0 > 50:  # >0.5s CPU in 3 min: real progress
            frozen_since = None
            continue
        frozen_since = frozen_since or time.monotonic()
        frozen_s = time.monotonic() - frozen_since
        log(f"trainer pid {pid} frozen {frozen_s / 60:.0f} min; probing")
        healthy = probe_healthy()
        if healthy:
            # Generous grace: a probe's own claim can linger ~3-10 min
            # after it exits, which blocks the trainer through a short
            # grace and would livelock kill->relaunch->probe cycles.
            log("relay healthy under a frozen trainer; 900s grace")
            time.sleep(900)
            c2 = cpu_jiffies(pid)
            if c2 is not None and c2 - c1 <= 50 and not retrain_done():
                log("trainer did not resume on a healthy relay -> "
                    "stale session; kill by pid + relaunch")
                try:
                    os.kill(pid, 15)
                    time.sleep(10)
                    if pid_alive(pid):
                        os.kill(pid, 9)
                except OSError:
                    pass
                if progress_deaths < max_progress_deaths:
                    progress_deaths += 1
                    relaunch_retrain()
                frozen_since = None
        elif frozen_s > frozen_cap_s:
            log("frozen past the hard cap; kill by pid + relaunch")
            try:
                os.kill(pid, 9)
            except OSError:
                pass
            if progress_deaths < max_progress_deaths:
                progress_deaths += 1
                relaunch_retrain()
            frozen_since = None
        else:
            time.sleep(420)
    log("retrain complete (holdout line present)")


def main() -> None:
    log(f"chain_r4 watcher up (pid {os.getpid()})")
    babysit_retrain()
    ck = os.path.join(REPO, "checkpoints")
    stage("gate",
          [sys.executable, os.path.join(REPO, "benchmarks",
                                        "compare_encoders.py"),
           os.path.join(ck, "pretrained"),
           os.path.join(ck, "pretrained_xl"),
           os.path.join(ck, "pretrained_xl2")],
          "/tmp/gate_r4.log", 2700)
    stage("sweep",
          [sys.executable, "-m", "benchmarks.sweep_r4_kernel"],
          "/tmp/sweep_r4.jsonl", 2700)
    stage("bench",
          [sys.executable, os.path.join(REPO, "bench.py")],
          "/tmp/bench_r4_validation.json", 3300,
          env_extra={"ORAG_BENCH_DEADLINE_S": "3000",
                     "ORAG_BENCH_PROBE_BUDGET_S": "1500"})
    log("chain complete")


if __name__ == "__main__":
    main()
