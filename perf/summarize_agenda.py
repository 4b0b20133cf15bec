"""Summarize a tpu_agenda log into one table: per-step headline numbers.

Usage: python perf/summarize_agenda.py /tmp/tpu_agenda2.log
"""

import json
import re
import sys


def main(path: str) -> None:
    step = None
    rows = []
    probes = []
    for line in open(path, encoding="utf-8", errors="replace"):
        m = re.match(r"=== (.+?) \d\d:\d\d:\d\d", line)
        if m:
            step = m.group(1).strip()
            continue
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                d = json.loads(line)
            except ValueError:
                continue
            if "value" in d:
                rows.append((step, d.get("value"),
                             d.get("demod_only_carriers"),
                             d.get("roofline_pct")))
            else:
                probes.append((step, d))
    if rows:
        print(f"{'step':44s} {'e2e carriers':>12s} {'demod':>8s} "
              f"{'roofline%':>9s}")
        for st, v, dm, rf in rows:
            print(f"{st[:44]:44s} {v!s:>12s} {dm!s:>8s} {rf!s:>9s}")
    for st, d in probes:
        print(f"\n[{st}]")
        for k, v in d.items():
            print(f"  {k}: {v}")
    if not rows and not probes:
        print("no JSON results found (gate still failing?)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_agenda2.log")
