"""Round-3 batch #3: END-TO-END A/B of kernel env-knob configs.

Micro-timings through the axon tunnel are untrustworthy in both
directions (r3_realtune: unchained same-input loops report 0.03 ms for
multi-ms kernels; chained loops report 140 ms at fill 8 for kernels the
end-to-end session executes in ~10 ms) — so every config here is scored
by the honest wall-clock of a full interactive session
(experiments/bench_interactive.py), one subprocess per config (the
tournament knobs are read at trace time, so a fresh process guarantees a
fresh trace).  Results append to r3_batch3.json as they land.
"""

import json
import os
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
OUT = ROOT / "experiments" / "r3_batch3.json"

CONFIGS = {
    # name -> (env overrides, extra argv)
    "baseline": ({}, []),
    # NOTE: group=256 shrinks g to block_m/256, which balloons the default
    # rounds formula (max(6, ceil(top_k/g))) — always pin rounds with it
    "tg256r6": ({"EVAVOS_TOUR_GROUP": "256", "EVAVOS_TOUR_ROUNDS": "6"}, []),
    "tr4": ({"EVAVOS_TOUR_ROUNDS": "4"}, []),
    "tg256r8": ({"EVAVOS_TOUR_GROUP": "256", "EVAVOS_TOUR_ROUNDS": "8"}, []),
    "ro_bq256": ({"EVAVOS_RO_BQ": "256", "EVAVOS_SKIP_VALIDATE": "1"}, []),
    "ro_bq512": ({"EVAVOS_RO_BQ": "512", "EVAVOS_SKIP_VALIDATE": "1"}, []),
    "sel_q512m2048": ({"EVAVOS_SEL_BM": "2048",
                       "EVAVOS_SKIP_VALIDATE": "1"}, []),
    "resident": ({"EVAVOS_SEL_METHOD": "resident"}, []),
}

FPS_RE = re.compile(r"steady-state: ([\d.]+) propagated frames/sec")
ROUND_RE = re.compile(r"round (\d+): bank=(\d+) certain, (\d+) frames, "
                      r"(\d+) ms")


def save(res):
    OUT.write_text(json.dumps(res, indent=1))


def run_one(name, env_over, argv, rounds):
    env = dict(os.environ)
    env.update(env_over)
    # NOTE: do NOT set JAX_COMPILATION_CACHE_DIR here — the client-side
    # persistent cache stalled the axon remote-compile flow (a run that
    # normally reaches round 1 in ~4 min sat >14 min without the strategy
    # print); the remote terminal keeps its own compile cache anyway.
    log = ROOT / "experiments" / f"r3_b3_{name}_r{rounds}.log"
    cmd = [sys.executable, str(ROOT / "experiments" / "bench_interactive.py"),
           "--rounds", str(rounds)] + argv
    for attempt in (1, 2):
        with open(log, "w") as fh:
            p = subprocess.run(cmd, env=env, stdout=fh,
                               stderr=subprocess.STDOUT, timeout=2400,
                               cwd=ROOT)
        text = log.read_text()
        m = FPS_RE.search(text)
        if m:
            per_round = [(int(f), int(ms))
                         for _, _, f, ms in ROUND_RE.findall(text)]
            tailn = max(1, len(per_round) // 2)
            tail = per_round[-tailn:]
            tail_fps = (sum(f for f, _ in tail)
                        / max(1e-9, sum(ms for _, ms in tail) / 1e3))
            return {"fps": float(m.group(1)), "tail_fps": round(tail_fps, 1),
                    "per_round": per_round}
        err = text.strip().splitlines()[-1][:160] if text.strip() else "empty"
        if attempt == 1 and ("UNAVAILABLE" in text or "Broken pipe" in text
                             or "remote_comp" in text):
            continue  # transient tunnel failure: retry once
        return {"error": err, "rc": p.returncode}
    return {"error": "retries exhausted"}


def main():
    only = sys.argv[1:] or list(CONFIGS)
    res = json.loads(OUT.read_text()) if OUT.exists() else {}
    for rounds in (10, 30):
        for name in only:
            if name not in CONFIGS:
                continue
            key = f"{name}_r{rounds}"
            if key in res and "error" not in res[key]:
                continue
            env_over, argv = CONFIGS[name]
            print(f"=== {key} ===", flush=True)
            res[key] = run_one(name, env_over, argv, rounds)
            print(key, res[key].get("fps"), res[key].get("tail_fps"),
                  res[key].get("error", ""), flush=True)
            save(res)
    print("BATCH3DONE", flush=True)


if __name__ == "__main__":
    main()
