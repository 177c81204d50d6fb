"""Acceleration-matrix lane: run the FULL block golden-vector suite (repo
jig tests + the reference's shipped-vector replay) under every
acceleration configuration — the analog of the reference running its
whole busted suite under all 8 LUARADIO_DISABLE_{VOLK,LIQUID,FFTW3F}
combinations (/root/reference/.github/workflows/tests.yml:96-105).

Configs:
  baseline          — fusion on, MXU layout auto
  no-fusion         — LUARADIO_TPU_DISABLE_FUSION=1
  mxu-layout        — LUARADIO_TPU_FORCE_MXU_LAYOUT=1
  no-fusion+mxu     — both
  time-shard-4      — LUARADIO_TPU_JIG_TIME_SHARD=4: every whole-vector
                      jig pass runs through process_sharded on a 4-device
                      virtual ("time",) mesh

Usage:  python tests/run_accel_matrix.py [--quick] [--out FILE]
Or via pytest:  pytest -m accel_matrix tests/test_accel_matrix_lane.py
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "baseline": {},
    "no-fusion": {"LUARADIO_TPU_DISABLE_FUSION": "1"},
    "mxu-layout": {"LUARADIO_TPU_FORCE_MXU_LAYOUT": "1"},
    "no-fusion+mxu": {"LUARADIO_TPU_DISABLE_FUSION": "1",
                      "LUARADIO_TPU_FORCE_MXU_LAYOUT": "1"},
    "time-shard-4": {"LUARADIO_TPU_JIG_TIME_SHARD": "4"},
}

#: the WHOLE suite (the reference runs its entire busted suite under all
#: 8 backend combos, tests.yml:96-105): receivers, runtime, ingest, and
#: parallel tests all run under every config — exactly where an
#: optimizer-rewrite bug would hide.  The accel_matrix lane test itself
#: is excluded by the conftest marker skip (no -m here).
FULL_TARGETS = ["tests"]
QUICK_TARGETS = ["tests/blocks/test_math.py", "tests/blocks/test_modem.py",
                 "tests/refparity/test_reference_protocol.py"]


def run_config(name: str, targets, timeout: float = 7200.0) -> dict:
    env = dict(os.environ)
    for cfg in CONFIGS.values():          # clear all knobs, then set ours
        for k in cfg:
            env.pop(k, None)
    env.update(CONFIGS[name])
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", *targets],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"config": name, "env": CONFIGS[name], "rc": -1,
                "passed": 0, "failed": 0,
                "seconds": round(time.time() - t0, 1),
                "tail": f"timed out after {timeout}s"}
    tail = (proc.stdout or "")[-4000:]
    m = re.search(r"(\d+) passed", tail)
    f = re.search(r"(\d+) failed", tail)
    rec = {"config": name, "env": CONFIGS[name], "rc": proc.returncode,
           "passed": int(m.group(1)) if m else 0,
           "failed": int(f.group(1)) if f else 0,
           "seconds": round(time.time() - t0, 1)}
    if proc.returncode != 0:
        rec["tail"] = tail[-1500:]
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="reduced target set (CI smoke of the lane itself)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None, help="single config name")
    args = ap.parse_args()
    targets = QUICK_TARGETS if args.quick else FULL_TARGETS
    rows = []
    names = [args.only] if args.only else list(CONFIGS)
    for name in names:
        rec = run_config(name, targets)
        print(json.dumps(rec), flush=True)
        rows.append(rec)
    summary = {"ok": all(r["rc"] == 0 for r in rows),
               "targets": targets, "configs": rows}
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(summary, fh, indent=1)
    print(json.dumps({"accel_matrix_ok": summary["ok"],
                      "n_configs": len(rows)}))
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
