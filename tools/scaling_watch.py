"""Calm-window hunter for the north_rule scaling measurement.

The box suffers multi-hour hypervisor-steal waves (BENCH.md machine
ceiling: calm pure-CPU 4->16-proc control scales at 0.95; contended
windows read 0.25-0.40).  A scaling run launched in a contended window
is wasted: bench.py records it under ``contended_attempts`` and keeps
the official calm number.  This watcher probes the 4->16 control
cheaply (~8 s) every ``interval`` seconds and launches the full
``bench.py --scaling`` measurement only when BOTH the efficiency ratio
and the absolute 4-proc rate look calm (the ratio alone can read high
in a window whose absolute throughput is halved -- that is a
neighbors-quiet-but-throttled window, still useless).

Exits 0 the moment a measurement lands uncontended (bench.py's own
start+end >=0.85 bracket), so SCALING.json's official number is
refreshed on round-current code.  Exits 3 at the deadline.

Run:  python tools/scaling_watch.py [max_hours]
Log:  /tmp/scaling_watch.jsonl (one JSON line per probe/attempt)
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench  # noqa: E402

LOG = "/tmp/scaling_watch.jsonl"
# fire thresholds: ratio near the 0.95 calibration AND absolute 4-proc
# rate near the calm ~565 units/s (BENCH.md) — both must hold
EFF_MIN = 0.78
ABS4_MIN = 470.0
INTERVAL = 150.0


def log(rec):
    rec["ts"] = time.time()
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    deadline = time.time() + float(
        sys.argv[1] if len(sys.argv) > 1 else 5.0) * 3600
    while time.time() < deadline:
        ctl = bench.machine_control(seconds=4.0)
        calm = (ctl["eff_4_to_16"] >= EFF_MIN
                and ctl["units_per_sec"][4] >= ABS4_MIN)
        log({"kind": "probe", "ctl": ctl, "calm": calm})
        if calm:
            # double-probe: steal waves have second-scale gaps that a
            # single 4 s probe can land inside; require two in a row
            time.sleep(20)
            ctl2 = bench.machine_control(seconds=4.0)
            calm2 = (ctl2["eff_4_to_16"] >= EFF_MIN
                     and ctl2["units_per_sec"][4] >= ABS4_MIN)
            log({"kind": "confirm", "ctl": ctl2, "calm": calm2})
            if not calm2:
                time.sleep(INTERVAL)
                continue
            log({"kind": "launch"})
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"),
                 "--scaling"],
                capture_output=True, text=True)
            ok = False
            try:
                line = [ln for ln in r.stdout.splitlines()
                        if ln.startswith("{")][-1]
                res = json.loads(line)
                # the merged SCALING.json comes back; uncontended iff
                # the fresh run's machine_control keys made it into the
                # top level (bench.py only merges a calm run)
                fresh = res.get("machine_control") is not None and \
                    not res.get("window_contended", False)
                ok = fresh
                log({"kind": "attempt", "uncontended": fresh,
                     "value": res.get("value")})
            except (IndexError, json.JSONDecodeError):
                log({"kind": "attempt_error",
                     "stderr": r.stderr[-2000:]})
            if ok:
                log({"kind": "done"})
                return 0
        time.sleep(INTERVAL)
    log({"kind": "deadline"})
    return 3


if __name__ == "__main__":
    sys.exit(main())
