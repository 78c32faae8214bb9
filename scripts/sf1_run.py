"""sf1-scale (4M-doc) DedupPipeline run, probe-gated (round-4 task #7).

Waits for a healthy host window (pure-JVM scan probe from
scripts/scaling_control.py within 1.5x of the archived quiet value),
then runs scripts/profile_stages.py at the budgeted slot count and
appends the probe-bracketed result to BENCH/SF1_RUN.json.

The point of the run is NOT a throughput headline — it is to exercise,
at ~10x the usual test scale, the mechanisms that only matter at scale:
LSH bucket caps + dropped-bucket accumulators, AQE skew handling, and
the broadcast-verify count-gated fallback — and to record the per-stage
breakdown plus planted-dup recall.

Usage: python scripts/sf1_run.py [n_docs] [slots] [max_wait_min] [boiler_pct]

boiler_pct > 0 plants the boilerplate mega-bucket hazard (see
profile_stages.py) so the record shows the caps firing at scale.
"""
from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
QUIET_SCAN_ROWS_PER_SEC = 1_577_548.8  # BENCH/CONTROLS.json scan.local4
HEALTH_FACTOR = 1.5


def probe() -> dict:
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "scaling_control.py"),
         "--child", "scan", "4"],
        capture_output=True, text=True, cwd=str(REPO), timeout=1800,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            res = json.loads(line)
            res["healthy"] = (
                res["rows_per_sec"] >= QUIET_SCAN_ROWS_PER_SEC / HEALTH_FACTOR
            )
            return res
    return {"error": (out.stdout[-200:] + out.stderr[-200:]).strip(),
            "healthy": False}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    slots = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    max_wait_min = int(sys.argv[3]) if len(sys.argv) > 3 else 90
    boiler_pct = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    deadline = time.time() + max_wait_min * 60
    pre = probe()
    print(json.dumps({"event": "probe", **pre}), flush=True)
    while not pre.get("healthy") and time.time() < deadline:
        time.sleep(240)
        pre = probe()
        print(json.dumps({"event": "probe", **pre}), flush=True)

    forced = not pre.get("healthy")
    if forced:
        print(json.dumps({"event": "forced_run_degraded_window"}), flush=True)

    t0 = time.time()
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "profile_stages.py"),
         str(slots), str(n_docs), str(boiler_pct)],
        capture_output=True, text=True, cwd=str(REPO), timeout=7200,
    )
    # profile_stages prints indented (multi-line) JSON: decode from the
    # last line that is exactly "{" (the top-level object opener)
    result = None
    lines = out.stdout.splitlines()
    for i in range(len(lines) - 1, -1, -1):
        if lines[i].strip() == "{":
            try:
                result = json.loads("\n".join(lines[i:]))
                break
            except json.JSONDecodeError:
                continue
    post = probe()
    record = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_docs": n_docs,
        "slots": slots,
        "boiler_pct": boiler_pct,
        "probe_pre": pre,
        "probe_post": post,
        "host_degraded": forced or not post.get("healthy"),
        "wall_secs": round(time.time() - t0, 1),
        "result": result,
        "stderr_tail": None,
    }
    if result is None:
        # keep the root-cause lines, not the shutdown-hook tail
        err_lines = [
            ln for ln in out.stderr.splitlines()
            if any(k in ln for k in
                   ("Error", "Exception", "Caused by", "OutOfMemory",
                    "Traceback", "raise ", "killed"))
        ]
        record["stderr_tail"] = (err_lines[:40] or
                                 out.stderr[-2000:].splitlines()[-20:])
        log = REPO / "BENCH" / f"sf1_fail_{int(time.time())}.stderr"
        log.write_text(out.stderr[-200_000:])
        record["stderr_log"] = str(log)
    path = REPO / "BENCH" / "SF1_RUN.json"
    existing = json.loads(path.read_text()) if path.exists() else []
    existing.append(record)
    path.write_text(json.dumps(existing, indent=1))
    print(json.dumps({"event": "done", "record": record}), flush=True)


if __name__ == "__main__":
    main()
