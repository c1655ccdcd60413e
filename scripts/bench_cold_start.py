"""Serving cold-start: time-to-first-clip for three deployment modes
(VERDICT r2 "Next round" #10 — the 111 s jit cold start motivated the AOT
export, but no artifact recorded what it buys).

Modes, each measured in a FRESH subprocess on the bench workload
(bench.build_sampler_fn — flagship UNet 25-step CFG sampling + VAE decode):

  jit     cold trace+compile, no persistent cache (the default today)
  cache   same program with a warm persistent compilation cache
          (GCD_JAX_CACHE; what a production host gets from its 2nd boot on)
  export  jax.export artifact (scripts/export_artifact.py path): deserialize
          + first call — no tracing, no model code, but XLA still compiles
          the StableHLO for the local backend
  restore the REAL serving boot (VERDICT r3 Weak #3): orbax-restore of
          checkpointed params + AOT artifact load + first clip, ALL inside
          the timed window — what `serve.py --artifact --model_path <orbax>`
          actually costs from process start

Writes PERF_COLDSTART.json at the repo root.

Usage:
    timeout 3600 python scripts/bench_cold_start.py
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

ARTIFACT = "/tmp/gcd_coldstart_sampler.jaxexp"
CACHE_DIR = "/tmp/gcd_coldstart_cache"
PARAMS_CKPT = "/tmp/gcd_coldstart_params"


def phase_jit() -> None:
    """Cold (or cache-warm, when GCD_JAX_CACHE is set) jit time-to-first-clip."""
    import jax

    if os.environ.get("GCD_JAX_CACHE"):
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["GCD_JAX_CACHE"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    t_start = time.time()
    from bench import build_sampler_fn

    run_clip = build_sampler_fn()
    out = run_clip(jax.random.PRNGKey(0))
    out.block_until_ready()
    print(json.dumps({"time_to_first_clip_s": round(time.time() - t_start, 1)}))


def phase_export() -> None:
    """Build + export the bench sampler program to ARTIFACT (not timed as
    cold start; this is the offline packaging step)."""
    import jax

    from bench import _make_run_clip_for_export

    fn, uparams, dparams = _make_run_clip_for_export()
    from jax import export as jexport

    sds = lambda t: jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), t)
    key_sds = sds(jax.random.PRNGKey(0))
    exp = jexport.export(fn)(sds(uparams), sds(dparams), key_sds)
    blob = bytes(exp.serialize())
    with open(ARTIFACT, "wb") as f:
        f.write(blob)
    print(json.dumps({"artifact_bytes": len(blob)}))


def phase_load() -> None:
    """Deserialize ARTIFACT + run the first clip — the AOT serving boot."""
    import jax

    t_start = time.time()
    from jax import export as jexport

    with open(ARTIFACT, "rb") as f:
        exp = jexport.deserialize(f.read())
    t_deser = time.time()

    # Params are arguments (not baked into the blob): materialize random
    # weights exactly like the bench does, OUTSIDE the timed window — a
    # serving host loads them from its checkpoint store in parallel anyway.
    from bench import _make_run_clip_for_export

    _, uparams, dparams = _make_run_clip_for_export()
    jax.block_until_ready((uparams, dparams))
    t_params = time.time()

    out = exp.call(uparams, dparams, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    t_first = time.time()
    print(json.dumps({
        "deserialize_s": round(t_deser - t_start, 1),
        "param_init_s": round(t_params - t_deser, 1),
        "first_call_s": round(t_first - t_params, 1),
        "time_to_first_clip_s": round((t_deser - t_start) + (t_first - t_params), 1),
    }))


def phase_save_params() -> None:
    """Offline prep for the restore mode: write the bench params to an orbax
    checkpoint (what scripts/convert_ckpt.py produces from a torch ckpt)."""
    import jax

    from bench import _make_run_clip_for_export
    from gcd_tpu.io.checkpoint import save_checkpoint

    _, uparams, dparams = _make_run_clip_for_export()
    jax.block_until_ready((uparams, dparams))
    save_checkpoint(PARAMS_CKPT, 0, {"uparams": uparams, "dparams": dparams})
    size = sum(os.path.getsize(os.path.join(dp, f))
               for dp, _, fs in os.walk(PARAMS_CKPT) for f in fs)
    print(json.dumps({"ckpt_bytes": size}))


def phase_restore() -> None:
    """The real serving boot: orbax restore + artifact deserialize + first
    clip, all timed (nothing excluded)."""
    import jax

    t_start = time.time()
    from jax import export as jexport

    with open(ARTIFACT, "rb") as f:
        exp = jexport.deserialize(f.read())
    t_deser = time.time()

    from gcd_tpu.io.checkpoint import restore_checkpoint

    restored = restore_checkpoint(PARAMS_CKPT, 0)
    uparams, dparams = restored["uparams"], restored["dparams"]
    jax.block_until_ready((uparams, dparams))
    t_restore = time.time()

    out = exp.call(uparams, dparams, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    t_first = time.time()
    print(json.dumps({
        "deserialize_s": round(t_deser - t_start, 1),
        "orbax_restore_s": round(t_restore - t_deser, 1),
        "first_call_s": round(t_first - t_restore, 1),
        "time_to_first_clip_s": round(t_first - t_start, 1),
    }))


def run_phase(phase: str, env_extra=None, timeout_s: int = 1500):
    env = dict(os.environ)
    env.update(env_extra or {})
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--phase", phase],
        capture_output=True, text=True, timeout=timeout_s, env=env, cwd=ROOT)
    if r.stderr:
        print(r.stderr[-1500:], file=sys.stderr)
    for line in reversed((r.stdout or "").strip().splitlines()):
        try:
            d = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
        # Per-row provenance (ADVICE r4): rows in one artifact can come
        # from different sessions (--skip_jit keeps old jit rows), so each
        # carries its own measurement time.
        if isinstance(d, dict):
            d["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        return d
    return {"error": f"phase {phase} failed rc={r.returncode}",
            "stderr_tail": (r.stderr or "")[-400:]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["jit", "cache", "export", "load",
                                        "save_params", "restore"])
    ap.add_argument("--out", default=os.path.join(ROOT, "PERF_COLDSTART.json"))
    ap.add_argument("--skip_jit", action="store_true",
                    help="keep the jit_cold/jit_warm_cache rows already in "
                         "--out (each costs ~7 min of TPU) and measure only "
                         "the export/AOT/restore phases")
    args = ap.parse_args()

    if args.phase in ("jit", "cache"):
        return phase_jit()
    if args.phase == "export":
        return phase_export()
    if args.phase == "load":
        return phase_load()
    if args.phase == "save_params":
        return phase_save_params()
    if args.phase == "restore":
        return phase_restore()

    results = {}

    def flush():
        # Persist after every phase: each phase costs minutes of TPU time
        # and a crashed orchestrator must not lose completed measurements.
        with open(args.out, "w") as f:
            json.dump({"metric": ("serving cold start: time-to-first-clip, "
                                  "bench workload"),
                       "modes": results}, f, indent=1)

    warm_note = (
        "on axon-tunnel hosts XLA compiles SERVER-side, so the local "
        "persistent cache cannot hit; expect parity with jit_cold here "
        "(within tunnel noise) and a near-instant boot on standard TPU hosts")
    if args.skip_jit and os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f).get("modes", {})
        for k in ("jit_cold", "jit_warm_cache"):
            if k in prev:
                results[k] = prev[k]
        if "jit_warm_cache" in results:
            results["jit_warm_cache"]["note"] = warm_note
        print("[cold-start] --skip_jit: kept jit rows from "
              f"{os.path.basename(args.out)}", file=sys.stderr, flush=True)
    else:
        print("[cold-start] phase 1/5: cold jit ...", file=sys.stderr,
              flush=True)
        results["jit_cold"] = run_phase("jit")
        flush()
        print("[cold-start] phase 2/5: warm the persistent cache ...",
              file=sys.stderr, flush=True)
        os.makedirs(CACHE_DIR, exist_ok=True)
        run_phase("jit", {"GCD_JAX_CACHE": CACHE_DIR})  # populate
        print("[cold-start] phase 3/5: cache-warm boot ...", file=sys.stderr,
              flush=True)
        results["jit_warm_cache"] = run_phase("jit",
                                              {"GCD_JAX_CACHE": CACHE_DIR})
        results["jit_warm_cache"]["note"] = warm_note
    flush()
    print("[cold-start] phase 4/5: export + AOT load ...", file=sys.stderr,
          flush=True)
    exp = run_phase("export")
    if "error" not in exp:
        results["export_artifact"] = exp
        flush()
        results["aot_load"] = run_phase("load")
        results["aot_load"]["note"] = (
            "param_init_s is EXCLUDED from time_to_first_clip_s here "
            "(random-weight materialization stands in for the checkpoint "
            "store; it is tunnel-load-bound and varies run to run — "
            "458.7/533.6/638.6 s across rounds, see measured_at); the "
            "'serving_restore' row measures the real boot")
        flush()
        print("[cold-start] phase 5/5: orbax save + restore boot ...",
              file=sys.stderr, flush=True)
        prep = run_phase("save_params")
        if "error" not in prep:
            results["serving_restore"] = run_phase("restore")
            results["serving_restore"]["ckpt_bytes"] = prep.get("ckpt_bytes")
        else:
            results["serving_restore"] = prep
    else:
        results["export_artifact"] = exp

    flush()
    print(json.dumps({"metric": ("serving cold start: time-to-first-clip, "
                                 "bench workload"),
                      "modes": results}))
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
