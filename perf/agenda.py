"""One-command real-chip evidence bundle (VERDICT round-2 item 10).

Replaces the ad-hoc perf/tpu_agenda*.sh ladder: one sequential run that
gates on TPU liveness, executes the standard measurement set, collects
every step's final JSON line, and writes a single versioned artifact:

    PYTHONPATH=/root/repo:/root/.axon_site python perf/agenda.py run-all
    # -> PERF_<git-sha>.json (or --out PATH)

Steps (each its own subprocess so a TPU worker crash in one cannot
corrupt the rest; CLAUDE.md rule 1 — never hard-kill mid-TPU-op, every
child uses its own in-process watchdog):

    gate-kernels perf/gate_kernels.py AOT-compile gate (every Pallas
                 production graph at bench shapes; compile only)
    bench        bench.py default (e2e headline + demod-only + voice)
    breakdown    perf/fused_breakdown.py per-stage ladder
    hbm          perf/hbm_bw_probe.py streaming-bandwidth calibration

`--quick` runs bench only.  `--steps a,b,c` selects explicitly.
`python perf/agenda.py gate-kernels` runs the compile gate alone (the
mandatory pre-commit check for Pallas-touching changes, CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STEPS = {
    "gate-kernels": [sys.executable, "perf/gate_kernels.py"],
    "bench": [sys.executable, "bench.py"],
    "breakdown": [sys.executable, "perf/fused_breakdown.py"],
    "hbm": [sys.executable, "perf/hbm_bw_probe.py"],
}


def _git_sha() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=ROOT,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _last_json_line(text: str):
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def gate(tries: int, timeout_s: int) -> bool:
    env = dict(os.environ, PERF_TIMEOUT_S=str(timeout_s))
    for attempt in range(1, tries + 1):
        r = subprocess.run([sys.executable, "perf/tpu_warm.py"],
                           cwd=ROOT, env=env)
        if r.returncode == 0:
            return True
        print(f"# gate attempt {attempt}/{tries} failed; retrying",
              flush=True)
        time.sleep(120)
    return False


def run_step(name: str, cmd: list) -> dict:
    print(f"=== {name} {time.strftime('%H:%M:%S')}", flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
    sys.stdout.write(r.stdout)
    sys.stderr.write(r.stderr[-4000:])
    out = {
        "elapsed_s": round(time.time() - t0, 1),
        "returncode": r.returncode,
        "result": _last_json_line(r.stdout),
    }
    if r.returncode != 0:
        out["stderr_tail"] = r.stderr[-1000:]
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="perf/agenda.py")
    ap.add_argument("command", choices=["run-all", "gate-kernels"])
    ap.add_argument("--out", default=None,
                    help="output JSON path (default PERF_<sha>.json)")
    ap.add_argument("--quick", action="store_true",
                    help="bench step only")
    ap.add_argument("--steps", default=None,
                    help=f"comma list from {sorted(STEPS)}")
    ap.add_argument("--gate-tries", type=int, default=12)
    args = ap.parse_args(argv)

    names = (["gate-kernels"] if args.command == "gate-kernels"
             else ["bench"] if args.quick
             else args.steps.split(",") if args.steps
             else ["gate-kernels", "hbm", "bench", "breakdown"])
    unknown = [n for n in names if n not in STEPS]
    if unknown:
        ap.error(f"unknown steps {unknown}; choose from {sorted(STEPS)}")

    sha = _git_sha()
    bundle = {
        "version": 1,
        "git": sha,
        "started_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                     time.gmtime()),
        "env": {k: v for k, v in os.environ.items()
                if k.startswith(("BENCH_", "PERF_", "TETRAEAR_",
                                 "GATE_"))},
        "steps": {},
    }
    if not gate(args.gate_tries, 600):
        print("AGENDA ABORT: TPU not answering", file=sys.stderr)
        return 1
    for n in names:
        bundle["steps"][n] = run_step(n, STEPS[n])
    prefix = "GATE" if args.command == "gate-kernels" else "PERF"
    out_path = args.out or os.path.join(ROOT, f"{prefix}_{sha}.json")
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(bundle, f, indent=1)
    print(f"# wrote {out_path}", flush=True)
    ok = all(s["returncode"] == 0 for s in bundle["steps"].values())
    return 0 if ok else 2


if __name__ == "__main__":
    raise SystemExit(main())
