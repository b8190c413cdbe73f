"""One-command TPU perf campaign (VERDICT r2 #5): run the bench across
the prepared ablation knobs with per-config subprocess isolation, so a
worker crash or backend outage costs one config, not the campaign.

Each config runs `bench.py` (which itself probes the backend, retries,
and always emits one JSON line) in its own process with a hard timeout;
results append to scripts/perf_campaign_results.jsonl as they land.

Usage (on TPU):  python scripts/perf_campaign.py [--quick]
  --quick: only the headline config + the two most promising ablations.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import subprocess
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "scripts", "perf_campaign_results.jsonl")
TIMEOUT = float(os.environ.get("KINETICA_CAMPAIGN_TIMEOUT", "2700"))

# name -> env overrides on top of the bench defaults (NC=24, B=64)
CONFIGS = {
    # the headline number (r2 claim to confirm: ~0.175-0.19 s/profile)
    "default": {},
    # all chunks in ONE device dispatch: removes the ~1 s/sweep of
    # per-chunk dispatch overhead if the runtime is not already hiding it
    "scan_dispatch": {"KINETICA_BENCH_CHUNK_MODE": "scan"},
    # halve the chained RHS kernel launches (9 -> 5 per eval at nr=1095)
    "dd_chunk_256": {"KINETICA_DD_CHUNK": "256"},
    # both
    "scan_dd256": {"KINETICA_BENCH_CHUNK_MODE": "scan",
                   "KINETICA_DD_CHUNK": "256"},
    # fused Newton solve (won ~8% on torture, lost ~10% on bench in r2 —
    # re-measure on top of the other wins)
    "inv_fused": {"KINETICA_BENCH_LINSOLVE": "inv_fused"},
    # smaller-scale reference point (r2: 0.115 s/profile, ~700-870x)
    "nc16": {"KINETICA_BENCH_NC": "16"},
    # wider sweep at the headline scale
    "b256": {"KINETICA_BENCH_BATCH": "256"},
    # ---- multi-tile scale (nc=60: 4473 rxns / 181 species, ns_pad=256).
    # The r3 trace found ~80% of the 33 ms/step UNATTRIBUTED in the
    # while-loop body here (docs/design.md "multi-tile step cost") — these
    # variants bracket the Newton linear-solve formulation, the largest
    # suspect: "inv" (default; per-iteration XLA pair matvecs), "lu"
    # (XLA triangular solves — launch-bound at nc<=24 but O(n^2) work vs
    # the inverse's O(n^2) matvec at much lower constant), and
    # "inv_fused" (one Pallas launch per solve, but batch-chunks to 8
    # members/launch at n_pad=256 -> 8 serialized launches/iteration).
    "nc60": {"KINETICA_BENCH_NC": "60"},
    "nc60_lu": {"KINETICA_BENCH_NC": "60", "KINETICA_BENCH_LINSOLVE": "lu"},
    "nc60_inv_fused": {"KINETICA_BENCH_NC": "60",
                       "KINETICA_BENCH_LINSOLVE": "inv_fused"},
    # lane-compacted factor refreshes (ops/linalg._inv_factor_gated): only
    # the lanes whose c drifted get the Gauss-Jordan + Newton-Schulz
    # rebuild — the collective ANY-lane gate fires ~every step at B=64
    # although per-lane rates are ~0.2, so the default pays the full-batch
    # inverse almost every iteration (the corrected multi-tile attribution)
    "inv_gated": {"KINETICA_BENCH_LINSOLVE": "inv_gated"},
    "nc60_inv_gated": {"KINETICA_BENCH_NC": "60",
                       "KINETICA_BENCH_LINSOLVE": "inv_gated"},
    # ---- round-4 ablation matrix over the tuning knobs (VERDICT r3
    # weak #5): {linsolve x jac_policy x lu_drift_tol} at nc=24/nc=60.
    # linsolve "auto" now IS inv_gated on accelerators, so "default"/
    # "nc60" are the gated baselines for these.
    "jac_always": {"KINETICA_BENCH_JAC_POLICY": "always"},
    "drift_01": {"KINETICA_BENCH_LU_DRIFT": "0.1"},
    "drift_06": {"KINETICA_BENCH_LU_DRIFT": "0.6"},
    "nc60_jac_always": {"KINETICA_BENCH_NC": "60",
                        "KINETICA_BENCH_JAC_POLICY": "always"},
    "nc60_drift_01": {"KINETICA_BENCH_NC": "60",
                      "KINETICA_BENCH_LU_DRIFT": "0.1"},
    "nc60_drift_06": {"KINETICA_BENCH_NC": "60",
                      "KINETICA_BENCH_LU_DRIFT": "0.6"},
}
QUICK = ["default", "scan_dispatch", "dd_chunk_256"]


def run_config(name, overrides):
    env = dict(os.environ)
    env.update(overrides)
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                           capture_output=True, text=True, timeout=TIMEOUT,
                           env=env)
        line = (r.stdout or "").strip().splitlines()
        parsed = json.loads(line[-1]) if line else None
        stderr_tail = "\n".join((r.stderr or "").splitlines()[-6:])
    except subprocess.TimeoutExpired:
        parsed, stderr_tail = None, f"TIMEOUT after {TIMEOUT:.0f}s"
    except Exception as exc:  # pragma: no cover
        parsed, stderr_tail = None, f"{type(exc).__name__}: {exc}"
    rec = {"config": name, "overrides": overrides,
           "wall_s": round(time.time() - t0, 1),
           "result": parsed, "stderr_tail": stderr_tail}
    with open(RESULTS, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    extra = (parsed or {}).get("extra", {})
    print(f"[{name}] {rec['wall_s']}s -> "
          f"{(parsed or {}).get('value')}x, "
          f"{extra.get('per_profile_ms')} ms/profile, "
          f"{extra.get('ms_per_step')} ms/step "
          f"({'ERR: ' + (parsed or {}).get('error', '') if (parsed or {}).get('error') else 'ok'})",
          flush=True)
    return rec


def main():
    requested = [a for a in sys.argv[1:] if not a.startswith("--")]
    if requested:
        unknown = [n for n in requested if n not in CONFIGS]
        if unknown:
            sys.exit(f"unknown config(s): {unknown}; known: {list(CONFIGS)}")
        names = requested
    elif "--quick" in sys.argv:
        names = QUICK
    else:
        names = list(CONFIGS)
    done = set()
    if os.path.exists(RESULTS):
        with open(RESULTS) as fh:
            for ln in fh:
                try:
                    rec = json.loads(ln)
                except json.JSONDecodeError:
                    continue
                if rec.get("result") and not rec["result"].get("error"):
                    done.add(rec["config"])
    for name in names:
        if name in done:
            print(f"[{name}] already measured — skipping (delete "
                  f"{RESULTS} to re-run)", flush=True)
            continue
        run_config(name, CONFIGS[name])


if __name__ == "__main__":
    main()
